# Serving image (reference: Dockerfile:18-128 — multi-stage, non-root,
# healthcheck with generous start period for model load + XLA warmup)
FROM python:3.12-slim AS base

ENV PYTHONUNBUFFERED=1 \
    PIP_NO_CACHE_DIR=1

WORKDIR /app

FROM base AS deps
COPY pyproject.toml README.md ./
COPY sskd_tpu ./sskd_tpu
RUN pip install --no-cache-dir .

FROM base AS runtime
RUN useradd --create-home --uid 10001 appuser
COPY --from=deps /usr/local/lib/python3.12/site-packages /usr/local/lib/python3.12/site-packages
COPY --from=deps /usr/local/bin/semantic-kd /usr/local/bin/semantic-kd
COPY sskd_tpu ./sskd_tpu
COPY configs ./configs
COPY scripts/entrypoint.sh ./entrypoint.sh
RUN chmod +x entrypoint.sh && chown -R appuser /app
USER appuser

ENV SEMANTIC_KD_CONFIG_PATH=/app/configs/service.yaml

EXPOSE 8000
# start period covers model load + first XLA compile
# (reference: Dockerfile:115-116 — 180s)
HEALTHCHECK --interval=30s --timeout=5s --start-period=180s --retries=3 \
    CMD python -c "import urllib.request,sys; sys.exit(0 if urllib.request.urlopen('http://localhost:8000/health', timeout=4).status==200 else 1)"

ENTRYPOINT ["./entrypoint.sh"]
