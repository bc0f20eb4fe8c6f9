"""Container/CI parity artifacts (reference Dockerfile:1-27,
docker-compose.yml, .github/workflows/docker-build.yml): compose config
parses, its dependency graph matches the medallion DAG, and every
service command targets the same runnable-module entry points the
orchestration e2e test already drives (no docker daemon in the sandbox —
the entry points themselves are exercised by
test_orchestration.test_run_medallion_end_to_end)."""

import shlex

import yaml

from etl_poor_main_pipeline_spark.orchestration import topological_layers
from etl_poor_main_pipeline_spark.orchestration.run_dag import Task

REPO = __file__.rsplit("/tests/", 1)[0]


def _compose() -> dict:
    with open(f"{REPO}/docker-compose.yml") as fh:
        return yaml.safe_load(fh)


def test_compose_parses_and_matches_dag_topology():
    cfg = _compose()
    services = cfg["services"]
    assert set(services) == {"bronze", "silver_us", "silver_ca", "gold"}
    # rebuild the dependency graph from compose and check it is the
    # medallion topology with completed-successfully edges
    tasks = {}
    for name, svc in services.items():
        deps = svc.get("depends_on", {})
        for cond in deps.values():
            assert cond["condition"] == "service_completed_successfully"
        tasks[name] = Task(name, (name,), upstream=tuple(deps))
    assert topological_layers(tasks) == [
        ["bronze"],
        ["silver_ca", "silver_us"],
        ["gold"],
    ]


def test_compose_commands_target_the_runnable_module():
    """Each service must invoke pipelines.__main__ with a parseable argv
    for its own layer — the containers and run_dag.py must drive the
    exact same entry points."""
    from etl_poor_main_pipeline_spark.pipelines.__main__ import main  # noqa: F401

    for name, svc in _compose()["services"].items():
        argv = shlex.split(svc["command"].replace("\n", " "))
        assert argv[:3] == ["python", "-m", "etl_poor_main_pipeline_spark.pipelines"]
        layer = argv[3]
        assert layer == name.split("_")[0]
        # shared lake volume mounted at the --lake-root the argv names
        lake_root = argv[argv.index("--lake-root") + 1]
        assert any(v.split(":")[1] == lake_root for v in svc["volumes"])


def test_dockerfile_and_workflow_are_consistent():
    with open(f"{REPO}/Dockerfile") as fh:
        docker = fh.read()
    # PySpark's hard requirements in the image: a JVM and the package deps
    assert "openjdk-17" in docker and "JAVA_HOME" in docker
    assert "requirements.txt" in docker
    with open(f"{REPO}/.github/workflows/docker-build.yml") as fh:
        wf = yaml.safe_load(fh)
    jobs = wf["jobs"]
    # the build job must gate on the test job (parity gate before publish)
    assert jobs["build-and-push"]["needs"] == "test"
    steps = " ".join(str(s) for s in jobs["test"]["steps"])
    assert "pytest" in steps and "sync_counts" in steps
    # requirements.txt pins must import-match the installed environment
    import pandas
    import pyarrow
    import pyspark

    reqs = open(f"{REPO}/requirements.txt").read()
    for mod in (pyspark, pyarrow, pandas):
        name = mod.__name__
        assert f"{name}=={mod.__version__}" in reqs
