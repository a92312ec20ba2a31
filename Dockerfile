# Runtime image for gpras-tpu pipelines (host-side; attach TPU via your
# platform's runtime). The native geometry engine builds at first use, so g++
# stays in the image.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/gpras-tpu
COPY pyproject.toml README.md ./
COPY gpras_tpu ./gpras_tpu
RUN pip install --no-cache-dir ".[dev]"

ENTRYPOINT ["python", "-m", "gpras_tpu"]
