# Container packaging for the PySpark analytics engine + REST catalog
# facade (parity with the reference's multi-stage Dockerfile:1-57:
# non-root user, /health healthcheck, port 8080, CMD = the server).
#
# The engine is pure Python over PySpark, so no build stage is needed —
# the official Spark image already carries the JVM, Spark and Python.
FROM apache/spark:4.0.0-python3

USER root
WORKDIR /app

# Copy the package, entrypoints and tooling (tests ride along so
# `docker run ... make test` works inside the container too)
COPY iceberg_rest_catalog_spark/ ./iceberg_rest_catalog_spark/
COPY __spark_entry__.py bench.py Makefile ./
COPY tools/ ./tools/
COPY tests/ ./tests/

# Non-root runtime user owning the warehouse volume (reference
# Dockerfile:28-31,42)
RUN groupadd -g 1001 appgroup \
    && useradd -u 1001 -g appgroup -m appuser \
    && mkdir -p /app/data \
    && chown -R appuser:appgroup /app
USER appuser

ENV PYTHONPATH=/app
EXPOSE 8080

HEALTHCHECK --interval=30s --timeout=3s --start-period=5s --retries=3 \
  CMD python -c "import urllib.request as u; u.urlopen('http://localhost:8080/health', timeout=2)" || exit 1

# REST catalog server with graceful SIGTERM shutdown (catalog/rest.py main)
CMD ["python", "-m", "iceberg_rest_catalog_spark.catalog.rest", \
     "--host", "0.0.0.0", "--port", "8080", "--warehouse", "/app/data"]
