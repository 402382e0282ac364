"""Scalar/text/vector helper functions — all compositions of built-in
``pyspark.sql.functions`` (JVM-side, codegen) unless a module says otherwise."""
