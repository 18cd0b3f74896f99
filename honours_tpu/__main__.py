from honours_tpu.cli import main

raise SystemExit(main())
