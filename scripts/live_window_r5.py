"""Round-5 live-window queue — now a thin alias for the production
validation kit.

The round-5 hardware queue (VERDICT r4 #1/#2: flagship 800^2 parity
certification at the shipped tuned defaults, the official drift-aware
bench, and the first hardware capacity number + out-of-sample scaling-
model check) is exactly what scripts/prod_validate.py runs, plus its
PASS/FAIL verdict against the g <= 2.6 ns/row break-even and the 2.0 ms
target (VERDICT r4 #4).  Keeping one queue implementation means the
next live window banks the validation-kit artifact directly.

Earlier rounds' bespoke queues live in git history (live_window.py is
round 4e's).

Usage: scripts/one_attempt.sh /tmp/live_window_r5.log python scripts/live_window_r5.py
"""

from __future__ import annotations

import importlib.util
import os
import sys

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    spec = importlib.util.spec_from_file_location(
        "prod_validate",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "prod_validate.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    sys.argv = ["prod_validate.py",
                "--out", os.path.join(REPO, "docs", "prod_validate_r5.jsonl")]
    mod.main()


if __name__ == "__main__":
    main()
