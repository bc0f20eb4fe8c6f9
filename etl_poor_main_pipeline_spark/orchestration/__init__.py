"""Orchestration artifacts (E4): the three-layer medallion dependency
chain — bronze -> silver(US) + silver(CA) -> gold — expressed as

- an Airflow DAG definition (``airflow_dag.py``), mirroring the
  reference's containerized Airflow setup (README.md:143-172,
  docker-compose.yml + DockerOperator per layer), and
- a dependency-ordered local runner (``run_dag.py``) that drives the
  SAME per-layer entry points (``pipelines.__main__``) without any
  scheduler installed — the testable artifact in this environment.

Both encode one graph, declared once in ``MEDALLION_DAG``.
"""

from .run_dag import MEDALLION_DAG, run_medallion, topological_layers

__all__ = ["MEDALLION_DAG", "run_medallion", "topological_layers"]
