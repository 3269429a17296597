"""spark-submit job entrypoints (north rule: "runs via spark-submit
--py-files on a multi-executor cluster")."""
