from terrain_tpu.cli import main

raise SystemExit(main())
