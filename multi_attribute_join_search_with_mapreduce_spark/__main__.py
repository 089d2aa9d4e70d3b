from multi_attribute_join_search_with_mapreduce_spark.cli import main

raise SystemExit(main())
