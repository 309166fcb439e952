"""Tests for the termios single-key teleop reader and the live quiver plot
(reference: Envs/ai2thor/RL_env_VAR.py:684-692, pretext.py:267-290,
utils.py:24-40 drawArrows)."""
from __future__ import annotations

import os
import sys

import numpy as np
import pytest


def _wait_ack(fd, timeout=30.0):
    """Read master-side bytes until the child's b'A' ack (echoes of our
    own writes also appear here — skip them)."""
    import select
    import time

    deadline = time.time() + timeout
    while time.time() < deadline:
        r, _, _ = select.select([fd], [], [], 0.5)
        if r and b"A" in os.read(fd, 64):
            # the raw-mode switch (tty.setraw, TCSAFLUSH) right after the
            # ack discards pending input; give the child time to enter it
            time.sleep(0.3)
            return
    raise TimeoutError("no ack from pty child")


def test_get_term_character_via_pty():
    """Drive the raw-mode reader through a real pseudo-terminal."""
    pty = pytest.importorskip("pty")
    pid, fd = pty.fork()
    if pid == 0:  # child: stdin IS the pty slave
        try:
            sys.stdin = os.fdopen(0)  # undo pytest's captured stdin
            from var_tpu.utils.teleop import get_term_character

            os.write(1, b"A")  # ready
            ch = get_term_character()
            os._exit(ord(ch) % 100)
        except BaseException:  # noqa: BLE001 - child must never unwind
            os._exit(99)
    _wait_ack(fd)
    os.write(fd, b"k")
    _, status = os.waitpid(pid, 0)
    assert os.WEXITSTATUS(status) == ord("k") % 100
    os.close(fd)


def test_make_input_fn_single_key_via_pty():
    """make_input_fn in single-key mode returns one char per call and
    raises EOFError on Ctrl-C."""
    pty = pytest.importorskip("pty")
    pid, fd = pty.fork()
    if pid == 0:
        try:
            sys.stdin = os.fdopen(0)  # undo pytest's captured stdin
            from var_tpu.utils.teleop import make_input_fn

            read = make_input_fn(single_key=True)
            got = []
            for _ in range(2):
                os.write(1, b"A")
                got.append(read())
            os.write(1, b"A")
            try:
                read()  # Ctrl-C -> EOFError
                os._exit(98)
            except EOFError:
                pass
            os._exit(0 if got == ["r", "z"] else 97)
        except BaseException:  # noqa: BLE001
            os._exit(99)
    for key in (b"r", b"z", b"\x03"):
        _wait_ack(fd)
        os.write(fd, key)
    _, status = os.waitpid(pid, 0)
    assert os.WEXITSTATUS(status) == 0
    os.close(fd)


def test_make_input_fn_line_fallback(monkeypatch):
    """Piped stdin (not a tty) -> line-based input()."""
    from var_tpu.utils import teleop

    monkeypatch.setattr(teleop, "stdin_is_tty", lambda: False)
    lines = iter(["r", "quit"])
    monkeypatch.setattr("builtins.input", lambda *_: next(lines))
    read = teleop.make_input_fn()
    assert read() == "r"
    assert read() == "quit"


def test_realtime_embedding_plot_headless(tmp_path):
    from var_tpu.utils.plotting import RealTimeEmbeddingPlot

    rng = np.random.RandomState(0)
    pts = {
        "img": np.concatenate(
            [rng.randn(10, 3), rng.randint(0, 5, (10, 1))], axis=1),
        "sound": np.concatenate(
            [rng.randn(10, 3), rng.randint(0, 5, (10, 1))], axis=1),
    }
    plot = RealTimeEmbeddingPlot(pts, 3, interactive=False)
    assert not plot.interactive
    # two updates: quivers are replaced, not accumulated
    plot.draw_arrows(np.array([[1.0, 0.0, 0.0]]), np.array([[0.0, 1.0, 0.0]]),
                     text="pairs 1")
    plot.draw_arrows(np.array([[0.0, 0.0, 1.0]]), None, text="pairs 2")
    assert plot.quiver_img is not None and plot.quiver_sound is None
    out = plot.save(str(tmp_path / "rt.png"))
    assert os.path.getsize(out) > 0
    plot.close()


def test_manual_collect_realtime_headless(tmp_path):
    """manuallyCollectPretextData with realTimeVec writes the live frame
    and the collected shard headlessly."""
    from var_tpu.config import gym_register, main_config
    from var_tpu.train.pretext import PretextTrainer

    cfg = main_config(env="arms")
    cfg.override(
        pretextDataDir=[str(tmp_path / "data")],
        pretextModelSaveDir=str(tmp_path / "model"),
        pretextModelLoadDir=str(tmp_path / "model" / "nope"),
        realTimeVec=True,
    )
    os.makedirs(tmp_path / "data" / "train", exist_ok=True)
    gym_register(cfg, env="arms")
    trainer = PretextTrainer(cfg)
    cmds = iter(["", "r", "", "r", "z", "q"])
    path = trainer.manuallyCollectPretextData(input_fn=lambda: next(cmds))
    assert os.path.exists(os.path.join(cfg.pretextModelSaveDir,
                                       "realtime_vec.png"))
