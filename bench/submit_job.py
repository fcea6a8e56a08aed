"""spark-submit entry for the scaling benchmark.

Submitted as ``spark-submit --master local[N] --py-files pkg.zip
submit_job.py --input ... --output ...`` — the package arrives via
--py-files exactly as it would on a real multi-executor cluster
(BASELINE.json north_rule deploy path).
"""

import sys

from pdf_extractor_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
