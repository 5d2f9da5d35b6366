"""Guard for the streamed-row temp-dir lifecycle (`_stream_tmp`):
queries() execution must leave /tmp clean — this process's `trs-*` dirs
are atexit-reaped, stale dirs from dead runs are swept, and (ADVICE r7)
a dir whose CHECKPOINT SUBDIRS are still being written is never treated
as stale just because its top-level mtime is old."""

from __future__ import annotations

import atexit
import importlib.util
import os
import shutil
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _entry_module():
    spec = importlib.util.spec_from_file_location(
        "spark_entry_streamtmp_test", os.path.join(_REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _age(path: str, hours: float) -> None:
    old = time.time() - hours * 3600
    os.utime(path, (old, old))


def test_stream_tmp_sweeps_stale_keeps_active_and_registers_atexit():
    mod = _entry_module()
    root = tempfile.gettempdir()

    stale = tempfile.mkdtemp(prefix="trs-guardtest-stale-")
    os.makedirs(os.path.join(stale, "ckpt"))
    _age(os.path.join(stale, "ckpt"), 3)
    _age(stale, 3)

    # ADVICE r7 case: top-level mtime old, but a checkpoint subdir file
    # written seconds ago — an uncapped streamed query in ANOTHER process
    # is mid-run; the sweep must not delete its checkpoint.
    active = tempfile.mkdtemp(prefix="trs-guardtest-active-")
    ckpt = os.path.join(active, "ckpt")
    os.makedirs(ckpt)
    with open(os.path.join(ckpt, "offsets"), "w") as fh:
        fh.write("0")
    _age(active, 3)  # parent mtime does NOT update on subdir writes

    fresh = tempfile.mkdtemp(prefix="trs-guardtest-fresh-")

    # the new dir must be registered for atexit removal so the process
    # exits with /tmp clean (the 'queries() leaves /tmp clean' contract
    # — removal mid-function would race the lazy memory sink, so
    # exit-time is the correct reap point). atexit's C implementation
    # exposes no handler list on any CPython 3 (ADVICE r8: the old
    # _exithandlers probe was dead code), so intercept registration
    # directly: _stream_tmp resolves `atexit.register` at call time.
    registered: list[tuple] = []
    real_register = atexit.register

    def spy_register(fn, *args, **kwargs):
        registered.append((fn, args, kwargs))
        return real_register(fn, *args, **kwargs)

    made = None
    mod_atexit = mod.atexit if hasattr(mod, "atexit") else atexit
    orig = mod_atexit.register
    mod_atexit.register = spy_register
    try:
        made = mod._stream_tmp("trs-guardtest-new-")
        assert os.path.isdir(made)
        assert not os.path.exists(stale), "stale trs-* dir not swept"
        assert os.path.exists(active), (
            "dir with recent checkpoint-subdir writes was swept (top-level "
            "mtime is not the staleness signal)"
        )
        assert os.path.exists(fresh), "fresh trs-* dir swept"
        reg = [
            (fn, args)
            for fn, args, _ in registered
            if args and args[0] == made
        ]
        assert reg, "new trs-* dir not atexit-registered for removal"
        assert reg[0][0] is shutil.rmtree
    finally:
        mod_atexit.register = orig
        for d in (stale, active, fresh):
            shutil.rmtree(d, ignore_errors=True)
        if made:
            shutil.rmtree(made, ignore_errors=True)


def test_stream_tmp_prefixes_cover_every_streamed_row():
    """Every _stream_tmp call site uses a trs- prefix (the sweep and the
    atexit reaper only see trs-*), so no streamed row can leak under a
    different name."""
    with open(os.path.join(_REPO, "__spark_entry__.py")) as fh:
        src = fh.read()
    import re

    for m in re.finditer(r"_stream_tmp\(\s*\"([^\"]+)\"", src):
        assert m.group(1).startswith("trs-"), m.group(1)
