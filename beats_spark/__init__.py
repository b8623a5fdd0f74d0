"""beats_spark — a PySpark-native re-implementation of the Beats
(elastic/beats, fork jrmolin/beats) shipper pipeline semantics:
harvest → parse → processor-chain → conditional route → per-sink output,
expressed as declarative DataFrame transformations so Catalyst/Tungsten
own the physical plan.

Reference semantics are cited per-module as ``file:line`` paths inside
``/root/reference/`` (read-only snapshot). This is a re-design, not a
port: the reference is a per-event interpreted Go chain; here every
operator is a ``DataFrame -> DataFrame`` transform built from
``pyspark.sql.functions`` columns, with vectorized pandas/Arrow UDFs
only where Catalyst has no equivalent (dissect/grok tokenization).
"""

__version__ = "0.1.0"
