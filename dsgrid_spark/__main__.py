from dsgrid_spark.cli import main

raise SystemExit(main())
