from multi_source_financial_data_pipeline_spark.cli import main

raise SystemExit(main())
