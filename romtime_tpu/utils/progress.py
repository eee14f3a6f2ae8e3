"""Throttled progress reporting for long offline loops.

The reference wraps its serial time loop in a throttled tqdm bar
(reference: fom/base.py:744-750). Here the time loop is one compiled
scan, so the long-running host loops are the offline μ-sweeps — this
module gives them the same affordance without a tqdm dependency: a
stderr line at most every ``min_interval`` seconds (and always for the
first and last item), silent when the loop finishes quickly.

Disable globally with ``ROMTIME_PROGRESS=0`` (e.g. in tests).
"""

import os
import sys
import time


def progress(iterable, label="sweep", total=None, min_interval=5.0):
    """Yield from ``iterable``, reporting throttled progress to stderr.

    ``total`` defaults to ``len(iterable)`` when available; unknown-length
    iterables report counts only.
    """
    if os.environ.get("ROMTIME_PROGRESS", "1") == "0":
        yield from iterable
        return

    if total is None:
        try:
            total = len(iterable)
        except TypeError:
            total = None

    start = time.time()
    last = 0.0
    for i, item in enumerate(iterable):
        yield item
        now = time.time()
        done = i + 1
        if done == total or now - last >= min_interval:
            last = now
            frac = f"{done}/{total}" if total else str(done)
            rate = (now - start) / done
            eta = ""
            if total and done < total:
                eta = f", eta {rate * (total - done):.0f}s"
            print(f"[{label}] {frac} (+{now - start:.1f}s{eta})",
                  file=sys.stderr, flush=True)
