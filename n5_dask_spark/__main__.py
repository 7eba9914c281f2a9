from n5_dask_spark.cli import main

raise SystemExit(main())
