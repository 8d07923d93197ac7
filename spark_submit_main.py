"""spark-submit entry point for the CLI (the north rule's cluster
launch path). ``python -m <pkg>`` works locally; under spark-submit the
script runs without package context, so this thin launcher imports the
package absolutely from the ``--py-files`` archive::

    zip -r pkg.zip yadamu___yet_another_data_migration_utility_spark
    spark-submit --master yarn --deploy-mode client \\
        --py-files pkg.zip spark_submit_main.py \\
        replay --log-path hdfs://wal/ --table-root s3a://lake/pages \\
        --checkpoint-dir hdfs://ckpt/ --create

``session.get_spark`` detects the spark-submit gateway and leaves
--master / driver sizing to the submit command; every verb works
unchanged (the same code path ``python -m`` takes).
"""

import sys

from yadamu___yet_another_data_migration_utility_spark.cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
