"""Composite analysis pipelines (the reference's six analyses),
Spark-first: lazy prep DAGs + Spark-parallelized Monte Carlo."""
