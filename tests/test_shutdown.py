"""Graceful-shutdown flag: first signal sets the cooperative stop flag (the
driver loops poll it and save a final checkpoint), and the previous handler
is restored so a second signal is a normal hard stop."""

import os
import signal

from physicsinformeddiffusionmodels_tpu.training import install_graceful_stop


def test_sigterm_sets_flag_once_then_restores(capsys):
    prev = signal.getsignal(signal.SIGTERM)
    try:
        should_stop = install_graceful_stop(signals=(signal.SIGTERM,))
        assert should_stop() is False
        os.kill(os.getpid(), signal.SIGTERM)
        assert should_stop() is True
        # handler restored: SIGTERM handler is back to what it was before
        assert signal.getsignal(signal.SIGTERM) == prev
        assert "saving checkpoint" in capsys.readouterr().out
    finally:
        signal.signal(signal.SIGTERM, prev)


def test_sigint_also_covered():
    prev = signal.getsignal(signal.SIGINT)
    try:
        should_stop = install_graceful_stop(signals=(signal.SIGINT,))
        os.kill(os.getpid(), signal.SIGINT)  # must NOT raise KeyboardInterrupt
        assert should_stop() is True
    finally:
        signal.signal(signal.SIGINT, prev)
