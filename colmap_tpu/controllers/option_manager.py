"""Option management: dataclass config tree + .ini project files + argparse.

Reference: src/colmap/controllers/option_manager.h:61-124 (999 LoC over
boost::program_options). Every subsystem contributes an Options dataclass;
flags use the reference's dotted names (e.g. --SiftExtraction.max_num_features)
so command lines port across; project .ini files round-trip
(option_manager.h:116-118 Read/Write).
"""

from __future__ import annotations

import argparse
import configparser
import dataclasses
from typing import Any, Dict, Optional

from colmap_tpu.controllers.feature_extraction import ImageReaderOptions
from colmap_tpu.controllers.feature_matching import FeatureMatchingOptions
from colmap_tpu.controllers.incremental_pipeline import IncrementalPipelineOptions
from colmap_tpu.features.matching import MatchingOptions
from colmap_tpu.features.sift import SiftExtractionOptions
from colmap_tpu.image.undistortion import UndistortCameraOptions
from colmap_tpu.mvs.fusion import StereoFusionOptions
from colmap_tpu.mvs.meshing import PoissonMeshingOptions
from colmap_tpu.mvs.patch_match import PatchMatchOptions


_SECTIONS = {
    "ImageReader": ImageReaderOptions,
    "SiftExtraction": SiftExtractionOptions,
    "SiftMatching": MatchingOptions,
    "FeatureMatching": FeatureMatchingOptions,
    "Mapper": IncrementalPipelineOptions,
    "PatchMatchStereo": PatchMatchOptions,
    "StereoFusion": StereoFusionOptions,
    "PoissonMeshing": PoissonMeshingOptions,
    "UndistortCamera": UndistortCameraOptions,
}

_SCALARS = (int, float, bool, str)


class OptionManager:
    """Holds one instance of every subsystem's options + top-level paths."""

    def __init__(self):
        self.project_path: Optional[str] = None
        self.database_path: Optional[str] = None
        self.image_path: Optional[str] = None
        self.options: Dict[str, Any] = {
            name: cls() for name, cls in _SECTIONS.items()
        }

    def __getattr__(self, name):
        opts = self.__dict__.get("options", {})
        if name in opts:
            return opts[name]
        raise AttributeError(name)

    # -- argparse bridge -----------------------------------------------------

    def add_all_args(self, parser: argparse.ArgumentParser):
        parser.add_argument("--project_path", type=str, default=None)
        parser.add_argument("--database_path", type=str, default=None)
        parser.add_argument("--image_path", type=str, default=None)
        for section, obj in self.options.items():
            for f in dataclasses.fields(obj):
                if not isinstance(getattr(obj, f.name, None), _SCALARS):
                    continue
                typ = type(getattr(obj, f.name))
                arg = f"--{section}.{f.name}"
                if typ is bool:
                    parser.add_argument(arg, type=lambda v: v.lower() in
                                        ("1", "true", "yes"), default=None)
                else:
                    parser.add_argument(arg, type=typ, default=None)

    def parse_args(self, args: argparse.Namespace):
        ns = vars(args)
        if ns.get("project_path"):
            self.read(ns["project_path"])
        for key in ("database_path", "image_path"):
            if ns.get(key) is not None:
                setattr(self, key, ns[key])
        for section in self.options:
            obj = self.options[section]
            updates = {}
            for f in dataclasses.fields(obj):
                v = ns.get(f"{section}.{f.name}")
                if v is not None:
                    updates[f.name] = v
            if updates:
                if getattr(obj, "__dataclass_params__").frozen:
                    self.options[section] = dataclasses.replace(obj, **updates)
                else:
                    for k, v in updates.items():
                        setattr(obj, k, v)

    # -- ini project files -----------------------------------------------------

    def write(self, path: str):
        cp = configparser.ConfigParser()
        cp["root"] = {}
        if self.database_path:
            cp["root"]["database_path"] = self.database_path
        if self.image_path:
            cp["root"]["image_path"] = self.image_path
        for section, obj in self.options.items():
            cp[section] = {}
            for f in dataclasses.fields(obj):
                v = getattr(obj, f.name)
                if isinstance(v, _SCALARS):
                    cp[section][f.name] = str(v)
        with open(path, "w") as fp:
            cp.write(fp)

    def read(self, path: str):
        cp = configparser.ConfigParser()
        if not cp.read(path):
            raise FileNotFoundError(path)
        if cp.has_option("root", "database_path"):
            self.database_path = cp["root"]["database_path"]
        if cp.has_option("root", "image_path"):
            self.image_path = cp["root"]["image_path"]
        for section, obj in self.options.items():
            if not cp.has_section(section):
                continue
            updates = {}
            for f in dataclasses.fields(obj):
                if not cp.has_option(section, f.name):
                    continue
                cur = getattr(obj, f.name)
                raw = cp[section][f.name]
                if isinstance(cur, bool):
                    updates[f.name] = raw.lower() in ("1", "true", "yes")
                elif isinstance(cur, int):
                    updates[f.name] = int(raw)
                elif isinstance(cur, float):
                    updates[f.name] = float(raw)
                elif isinstance(cur, str):
                    updates[f.name] = raw
            if updates:
                if getattr(obj, "__dataclass_params__").frozen:
                    self.options[section] = dataclasses.replace(obj, **updates)
                else:
                    for k, v in updates.items():
                        setattr(obj, k, v)
