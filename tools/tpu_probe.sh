# Shared TPU liveness probe, sourced by the round drivers (round4.sh,
# r3_restart.sh, round3b.sh). Retries for up to ~40 min: the tunneled
# worker has been observed to wedge for 5-20 min after a killed job and
# to stay down for hours during remote restarts.
probe_tpu() {
  for i in $(seq 1 40); do
    if timeout 300 python - <<'PYEOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
x = jax.jit(lambda a: a @ a)(jnp.ones((128, 128)))
x.block_until_ready()
PYEOF
    then return 0; fi
    echo "[tpu_probe $(date +%H:%M:%S)] probe failed ($i), retrying in 60s"
    sleep 60
  done
  return 1
}
