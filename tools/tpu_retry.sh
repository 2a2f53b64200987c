#!/bin/bash
# Patient single-process TPU runner: probe, then payload, with retries.
PAYLOAD="$1"; LOG="$2"; MAX_TRIES="${3:-8}"
PAYLOAD_TIMEOUT="${PAYLOAD_TIMEOUT:-480}"
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
for i in $(seq 1 "$MAX_TRIES"); do
  echo "[tpu_retry] attempt $i probe" >> "$LOG"
  # generous probe: backend init over the tunnel has been observed to
  # take 300+ s in otherwise-healthy windows
  if timeout 330 python -u -c "import jax,numpy,jax.numpy as jnp; print(numpy.asarray(jax.jit(lambda x:x+1)(jnp.arange(2))))" >> "$LOG" 2>&1; then
    echo "[tpu_retry] probe ok; running payload" >> "$LOG"
    if timeout "$PAYLOAD_TIMEOUT" python -u "$PAYLOAD" >> "$LOG" 2>&1; then
      echo "[tpu_retry] payload ok" >> "$LOG"; exit 0
    fi
    echo "[tpu_retry] payload failed/hung" >> "$LOG"
  else
    echo "[tpu_retry] probe failed" >> "$LOG"
  fi
  sleep 180
done
echo "[tpu_retry] gave up" >> "$LOG"; exit 1
