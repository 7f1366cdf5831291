"""Graceful-shutdown hook for long training runs.

The reference only persists state at sampling milestones
(`/root/reference/main.py:181-187`), so an interrupted run loses up to
`sample_freq` steps of work. Production runs on shared/preemptible chips need
better: ``install_graceful_stop()`` turns SIGTERM/SIGINT into a cooperative
flag the driver loop polls each iteration, saving a final checkpoint before
exiting instead of dying mid-step. A second signal falls back to the default
(hard) behavior so a stuck save can still be interrupted.
"""

from __future__ import annotations

import signal
from typing import Callable


def install_graceful_stop(
    signals: tuple[int, ...] = (signal.SIGTERM, signal.SIGINT),
) -> Callable[[], bool]:
    """Install one-shot handlers; returns ``should_stop()``.

    First delivery of any of ``signals`` sets the flag and restores the
    previous handlers for ALL installed signals, so a second signal of any
    kind (e.g. SIGTERM then Ctrl-C during a stuck save) terminates normally.
    """
    state = {"stop": False}
    previous = {}

    def handler(signum, frame):
        state["stop"] = True
        for s, prev in previous.items():
            # signal.signal() returns None for handlers installed outside
            # Python; passing that back raises and would abort the restore
            # of the remaining signals — fall back to the OS default
            signal.signal(s, prev if prev is not None else signal.SIG_DFL)
        print(
            f"signal {signal.Signals(signum).name}: finishing current step, "
            "saving checkpoint, then exiting (send again to force)",
            flush=True,
        )

    for s in signals:
        previous[s] = signal.signal(s, handler)

    return lambda: state["stop"]
