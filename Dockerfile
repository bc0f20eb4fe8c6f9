# Container twin of the per-layer runnable entry points (E4) — the
# Spark-first analogue of the reference's python:3.9-slim image
# (reference Dockerfile:1-27). PySpark needs a JVM, so the base adds
# Java 17 (headless) on top of slim Python; everything else mirrors the
# reference's venv + requirements + copy layout so layer caching works
# the same way.
#
# Each container invocation is ONE layer run:
#   docker run <img> python -m etl_poor_main_pipeline_spark.pipelines \
#       bronze --lake-root /lake --date-id 2026-01-01
# On a real cluster the same package is submitted with spark-submit
# (master yarn/k8s) instead of the bundled local-mode JVM; the entry
# points and argv are identical — that is the point of E4.

FROM python:3.11-slim-bookworm

WORKDIR /app

# JVM for PySpark; procps for the spark-class launcher's `ps`
RUN apt-get update && apt-get install -y --no-install-recommends \
    openjdk-17-jre-headless \
    procps \
    && rm -rf /var/lib/apt/lists/*
ENV JAVA_HOME=/usr/lib/jvm/java-17-openjdk-amd64

# Virtual env, same pattern as the reference image
ENV VIRTUAL_ENV=/opt/venv
RUN python -m venv $VIRTUAL_ENV
ENV PATH="$VIRTUAL_ENV/bin:$PATH"

RUN pip install --no-cache-dir --upgrade pip
COPY requirements.txt .
RUN pip install --no-cache-dir -r requirements.txt

# Application code (no .env / secrets baked in)
COPY . .

ENV PYTHONUNBUFFERED=1
ENV PYTHONPATH="/app"
