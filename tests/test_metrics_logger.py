"""MetricsLogger: async device->host fetch semantics.

The drivers call ``logger.log`` once per chunk dispatch with jax device
scalars; ``log`` must NOT block (no ``float()`` round-trip — on a
tunneled TPU that RPC costs tens of ms per dispatch), and ``flush`` must
materialize every pending value into the CSV.
"""

import csv

import jax.numpy as jnp

from physicsinformeddiffusionmodels_tpu.training.metrics import MetricsLogger


def test_device_scalars_materialize_at_flush(tmp_path):
    lg = MetricsLogger(str(tmp_path))
    lg.log({"loss": jnp.float32(1.5), "n": 7}, step=1)
    lg.log({"loss": jnp.float32(2.5), "extra": jnp.float32(0.25)}, step=2)
    lg.flush()
    # a second flush after more rows must re-emit everything (append-only
    # rewrite semantics) and convert only the still-pending values
    lg.log({"loss": jnp.float32(-3.0)}, step=3)
    lg.close()

    rows = list(csv.DictReader(open(lg.path)))
    assert [r["step"] for r in rows] == ["1", "2", "3"]
    assert [float(r["loss"]) for r in rows] == [1.5, 2.5, -3.0]
    assert float(rows[0]["n"]) == 7
    assert float(rows[1]["extra"]) == 0.25


def test_log_does_not_block(monkeypatch, tmp_path):
    # log() must never call float() on a device value (that is the blocking
    # transfer); it may only *start* the async copy
    class Scalar:
        def __init__(self, v):
            self.v = v
            self.async_started = False

        def copy_to_host_async(self):
            self.async_started = True

        def __float__(self):
            assert self.async_started, "float() before async copy started"
            return self.v

    s = Scalar(4.0)
    lg = MetricsLogger(str(tmp_path))
    lg.log({"loss": s}, step=1)
    assert s.async_started  # transfer was initiated in log()...
    lg.flush()  # ...and materialized only at flush
    rows = list(csv.DictReader(open(lg.path)))
    assert float(rows[0]["loss"]) == 4.0
