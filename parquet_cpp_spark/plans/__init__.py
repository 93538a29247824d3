"""Job plans: the fixed 3-stage pipeline (repartition -> encode-UDF -> write)
with explicit shuffle control, skew salting, and manifest-based resume."""
