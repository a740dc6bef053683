from rtwc_tpu.engine.run import main

raise SystemExit(main())
