from colmap_tpu.cli import main

raise SystemExit(main())
