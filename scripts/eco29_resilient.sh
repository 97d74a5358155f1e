#!/usr/bin/env bash
# Crash-resilient eco29 driver: the tunneled TPU worker sporadically dies
# under long runs (see CLAUDE.md); row-tile checkpoints make a rerun
# resume at group granularity, so the answer is a retry loop around the
# runner.  Usage: scripts/eco29_resilient.sh OUT.json CKPT_DIR [MAX_TRIES]
set -u
OUT=${1:?out json}
CKPT=${2:?ckpt dir}
TRIES=${3:-8}
mkdir -p "$CKPT"
for ((a=1; a<=TRIES; a++)); do
    echo "=== attempt $a ($(date -u +%H:%M:%S)) ===" >&2
    if python "$(dirname "$0")/eco29_run.py" "$OUT" "$CKPT"; then
        echo "=== completed on attempt $a ===" >&2
        exit 0
    fi
    echo "=== attempt $a failed; waiting for TPU worker recovery ===" >&2
    for ((w=0; w<30; w++)); do
        sleep 60
        if timeout 120 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp, numpy as np
assert int(np.asarray(jax.device_get(jnp.zeros(8, jnp.int32)))[0]) == 0
EOF
        then break; fi
    done
done
echo "=== gave up after $TRIES attempts ===" >&2
exit 1
