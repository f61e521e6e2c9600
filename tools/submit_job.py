"""spark-submit driver script: thin shim over miru_spark.cli.

    spark-submit --py-files dist/miru_spark.zip tools/submit_job.py build ...
"""

import sys

from miru_spark.cli import main

if __name__ == "__main__":
    main(sys.argv[1:])
