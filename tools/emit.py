"""One-line-JSON emitter for the rehearsal tools.

VERDICT r11 #3: REHEARSAL_dedup_pipeline_r11.json was committed with
four JVM GC-warning lines prepended — the artifact had been created by
shell-redirecting the rehearsal's stdout, which also captures whatever
the JVM prints. Rehearsal artifacts must be written with ``json.dump``
straight to the target path, never assembled from a stream the JVM
shares. ``emit`` keeps the stdout line (interactive runs, driver
capture) AND, when ``REHEARSAL_OUT`` names a path, writes the payload
to it atomically (tmp + rename) so a crashed run cannot leave a
half-written artifact either.
"""

from __future__ import annotations

import json
import os


def emit(payload: dict) -> None:
    out = os.environ.get("REHEARSAL_OUT")
    if out:
        tmp = out + ".tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f)
            f.write("\n")
        os.replace(tmp, out)
    print(json.dumps(payload))
