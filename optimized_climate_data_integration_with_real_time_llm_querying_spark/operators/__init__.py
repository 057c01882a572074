"""Large-scale training-data pipeline operators.

All hot paths are JVM-side column expressions (whole-stage codegen);
Python appears only in clearly-marked Pandas-UDF slow paths
(multimodal decode stubs).
"""
