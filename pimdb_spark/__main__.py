from pimdb_spark.cli import main

raise SystemExit(main())
