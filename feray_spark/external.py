"""External-job protocol — SURVEY §2.10 F6.

The reference submits an external script as the computation and
collects metadata / data_version back over a message channel (Dagster
Pipes over the Ray job API: `ray_integration.py:44-55`,
`ray_external.py:4-16`, `lazy_local_ray.py:16-44`). The engine-side
contract is small and engine-agnostic:

- a **job spec**: entrypoint + ``extras`` dict (the reference passes
  ``{"param": "value"}``);
- a **report channel**: the external process reports materialization
  ``metadata`` and a ``data_version`` string back to the caller
  (the reference's ``report_asset_materialization``,
  `ray_external.py:10-16`).

Here the channel is a JSON file handed to the subprocess via the
``FERAY_PIPES_CHANNEL`` env var (the spirit of Dagster Pipes without
the dependency); extras travel in ``FERAY_PIPES_EXTRAS``. In
production the entrypoint would be ``spark-submit`` / a Spark Connect
client; the protocol is identical, so tests drive it with plain
``python`` entrypoints to keep JVM startup off the test clock.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
from dataclasses import dataclass, field

CHANNEL_ENV = "FERAY_PIPES_CHANNEL"
EXTRAS_ENV = "FERAY_PIPES_EXTRAS"


@dataclass(frozen=True)
class ExternalResult:
    returncode: int
    metadata: dict = field(default_factory=dict)
    data_version: str | None = None
    stdout: str = ""
    stderr: str = ""


def report_materialization(metadata: dict, data_version: str | None = None) -> None:
    """Called INSIDE the external script: report results back over the
    channel (twin of `ray_external.py:10-16`)."""
    path = os.environ.get(CHANNEL_ENV)
    if not path:
        raise RuntimeError("no pipes channel: run under run_external_job()")
    # atomic publish: a crash mid-dump must leave NO channel file, not
    # a truncated one the harvester would choke on
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump({"metadata": metadata, "data_version": data_version}, f)
    os.replace(tmp, path)


def get_extras() -> dict:
    """Called INSIDE the external script: the job spec's extras
    (twin of `ray_external.py:7-9`)."""
    return json.loads(os.environ.get(EXTRAS_ENV, "{}"))


def run_external_job(
    entrypoint: list[str],
    extras: dict | None = None,
    *,
    timeout: float = 600,
) -> ExternalResult:
    """Submit an external process and harvest its materialization
    report (twin of `ray_integration.py:49-55` + ``get_results()``).

    ``entrypoint`` is an argv list (e.g. ``[sys.executable, script]``
    or ``["spark-submit", job.py]``).
    """
    with tempfile.TemporaryDirectory() as td:
        channel = os.path.join(td, "channel.json")
        env = dict(os.environ)
        env[CHANNEL_ENV] = channel
        env[EXTRAS_ENV] = json.dumps(extras or {})
        proc = subprocess.run(
            entrypoint, env=env, capture_output=True, text=True, timeout=timeout
        )
        report = {}
        if os.path.exists(channel):
            # a crashed/misbehaving child must never cost the caller
            # the returncode/stderr they need to diagnose it: a
            # malformed or non-dict channel degrades to an empty
            # report (the atomic write makes this a can't-happen for
            # our own report_materialization, but the channel is an
            # external contract)
            try:
                with open(channel) as f:
                    parsed = json.load(f)
                if isinstance(parsed, dict):
                    report = parsed
            # ValueError covers BOTH JSONDecodeError and the
            # UnicodeDecodeError a non-UTF-8 (binary/latin-1) channel
            # raises before the JSON parser even runs — the
            # degrade-to-empty-report contract must hold for every
            # malformed byte stream an external job can produce
            except (ValueError, OSError):
                pass
        # same degrade-don't-crash rule one level down: "metadata":
        # null (or a non-dict) in an otherwise well-formed channel must
        # not break the ExternalResult.metadata: dict contract
        metadata = report.get("metadata")
        if not isinstance(metadata, dict):
            metadata = {}
        # data_version carries the same str|None contract: a channel
        # writing a non-string must degrade to None, not leak an int
        # into callers doing .startswith(...)
        dv = report.get("data_version")
        if not isinstance(dv, str):
            dv = None
        return ExternalResult(
            returncode=proc.returncode,
            metadata=metadata,
            data_version=dv,
            stdout=proc.stdout,
            stderr=proc.stderr,
        )


def _self_test_entrypoint() -> None:  # pragma: no cover — subprocess target
    extras = get_extras()
    report_materialization(
        metadata={"rows": 3, "echo": extras.get("param")}, data_version="alpha"
    )


if __name__ == "__main__":  # allows `python -m feray_spark.external` as a job
    _self_test_entrypoint()
    sys.exit(0)
