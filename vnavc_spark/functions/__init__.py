"""Column-function library (scalar surface of SURVEY.md §2.7-§2.8).

Everything here returns Spark Column expressions built from
``pyspark.sql.functions`` so they stay inside whole-stage codegen;
pandas-UDF fallbacks exist only where a Python library is genuinely
required (Vietnamese NLP in ``vietnamese.py``, DSP in
``pipeline/audio.py``).
"""

from vnavc_spark.functions import quality, text, vector

__all__ = ["text", "quality", "vector"]
