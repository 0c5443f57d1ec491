"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference ETL pipeline (estonezzz/nrg-etl-airflow-spark-emr),
rebuilt Spark-first.

The reference is an Airflow-orchestrated EMR/Spark ETL job
(reference: dags/spark_submit_airflow.py:204-244); all of its relational
capability is inventoried in SURVEY.md §2 and re-expressed here as an
importable library:

- ``session``    — tuned SparkSession factory (AQE, UTC, Arrow)
- ``sources``    — table registry / readers / partitioned writers
- ``operators``  — relational + analytic + LLM-pipeline operators
- ``plans``      — named query catalog wired into ``__spark_entry__``
- ``streaming``  — Structured Streaming over the ``events`` table
- ``qc``         — declarative data-quality framework (reference nrg_qc.py, fixed)
- ``pipelines``  — reference-shaped ETL pipeline (nrg_etl.py semantics, fixed)
"""

__version__ = "0.1.0"
