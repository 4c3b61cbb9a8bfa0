from osarchiver_spark.main import run

raise SystemExit(run())
