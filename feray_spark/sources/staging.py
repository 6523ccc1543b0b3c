"""Staging for file-source streams over single-file fixtures.

Spark's file stream source requires a DIRECTORY; a single parquet
file is exposed by symlinking it into a per-source stage dir. The
stage root must be PRIVATE to the caller: a predictable path in a
world-shared /tmp would let another local user pre-create the dir
(or swap the symlink between the readlink check and Spark's read)
and feed attacker-controlled files into the stream. One definition
here serves both ``streaming.fastlane`` and ``features.store`` so
the hardening can never diverge between the two again.
"""

from __future__ import annotations

import hashlib
import os
import tempfile


def private_stage_root(prefix: str = "feray_stage") -> str:
    """A per-user 0700 directory under the system tempdir. Raises if
    the path exists but is owned by someone else, is a symlink, or is
    group/world accessible — never silently stage through a dir
    another user controls (and never silently "repair" loose perms:
    during the loose window a foreign tag dir may already have been
    planted inside, so the only safe move is to stop)."""
    root = os.path.join(tempfile.gettempdir(), f"{prefix}_{os.getuid()}")
    os.makedirs(root, mode=0o700, exist_ok=True)
    st = os.lstat(root)
    if st.st_uid != os.getuid() or os.path.islink(root):
        raise RuntimeError(f"stage root {root} is not owned by this user")
    if st.st_mode & 0o077:
        raise RuntimeError(
            f"stage root {root} is group/world accessible "
            f"(mode {oct(st.st_mode & 0o777)}); remove it and rerun"
        )
    return root


def stage_single_file(src: str, stage_root: str) -> str:
    """Symlink ``src`` into ``<stage_root>/<sha256(src)[:12]>/`` and
    return that directory. A stale, dangling, or foreign link is
    replaced, not trusted — ``os.path.exists`` FOLLOWS links, so a
    dangling one would otherwise slip past an exists() guard straight
    into ``os.symlink``'s FileExistsError. The tag is deterministic
    so a restarted stream's checkpoint resolves the same source
    directory."""
    # absolute target: a RELATIVE src would symlink relative to the
    # stage dir (not the caller's cwd) — a dangling link the readlink
    # guard below would happily "validate" on restart
    src = os.path.abspath(src)
    tag = hashlib.sha256(src.encode()).hexdigest()[:12]
    stage = os.path.join(stage_root, tag)
    os.makedirs(stage, exist_ok=True)
    # re-validate the TAG dir with the same discipline as the root: a
    # planted symlink here (possible if the root ever sat loose)
    # would otherwise route the stream link into a directory someone
    # else controls — makedirs(exist_ok=True) happily follows it
    st = os.lstat(stage)
    if os.path.islink(stage) or st.st_uid != os.getuid():
        raise RuntimeError(f"stage dir {stage} is not owned by this user")
    link = os.path.join(stage, os.path.basename(src))
    if not (os.path.islink(link) and os.readlink(link) == src):
        if os.path.lexists(link):
            os.unlink(link)
        os.symlink(src, link)
    return stage
