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


def test_first_signal_restores_all_handlers(capsys):
    """SIGTERM followed by Ctrl-C (the common force-quit sequence during a
    stuck save) must be a hard stop: the first delivery restores the previous
    handlers for EVERY installed signal, not just the delivered one."""
    prev_term = signal.getsignal(signal.SIGTERM)
    prev_int = signal.getsignal(signal.SIGINT)
    try:
        should_stop = install_graceful_stop(
            signals=(signal.SIGTERM, signal.SIGINT)
        )
        os.kill(os.getpid(), signal.SIGTERM)
        assert should_stop() is True
        assert signal.getsignal(signal.SIGTERM) == prev_term
        assert signal.getsignal(signal.SIGINT) == prev_int
    finally:
        signal.signal(signal.SIGTERM, prev_term)
        signal.signal(signal.SIGINT, prev_int)
