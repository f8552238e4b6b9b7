from etl_gardener_spark.cli import main

raise SystemExit(main())
