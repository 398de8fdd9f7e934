from svdsolver_tpu.cli import main

raise SystemExit(main())
