#!/usr/bin/env python3
"""spark-submit entry for the operator CLI (spark-submit takes a script
file, not a module):

    spark-submit --py-files fa_spark.zip jobs/cli_job.py <subcommand> ...

See fa_spark/cli.py for subcommands (analyze / corpus / query / expire).
"""

from fa_spark.cli import main

if __name__ == "__main__":
    main()
