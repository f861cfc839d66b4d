"""Live terminal viewer: the headless equivalent of the reference's
winit window + input loop (reference src/lib.rs:44-106).

The reference couples a live frame loop to the running sim: per frame it
computes dt, steps physics, routes keyboard/mouse input to a
CameraController, and presents a rendered frame with an FPS overlay
(src/rendering.rs:317-466). This module reproduces that behavior for a
terminal: frames come from the native rasterizer, presentation is ANSI
24-bit half-block cells (two pixels per character row), input is raw
non-blocking stdin (WASD/space move, arrow keys look — the same
CameraController math, render/camera.py), and the window title line shows
the steps/s readout that stands in for the imgui FPS window
(src/rendering.rs:463).

Works without a tty (input disabled, frames still rendered/presented) so
the loop is testable headlessly — `python -m physics_tpu.demo --live`.
"""

from __future__ import annotations

import os
import select
import sys
import time

import numpy as np

_CSI = "\x1b["


def ansi_frame(img: np.ndarray, cols: int, rows: int) -> str:
    """RGB uint8 [H, W, 3] → ANSI half-block string of cols×rows cells.

    Each character cell shows two vertically stacked pixels via '▀' with
    independent fg (top) / bg (bottom) 24-bit colors.
    """
    h = max(rows * 2, 2)
    w = max(cols, 2)
    ys = (np.linspace(0, img.shape[0] - 1, h)).astype(np.int32)
    xs = (np.linspace(0, img.shape[1] - 1, w)).astype(np.int32)
    small = img[ys][:, xs]                       # [h, w, 3]
    top, bot = small[0::2], small[1::2]          # [rows, w, 3] each
    out = []
    for r in range(rows):
        line = []
        for c in range(w):
            tr, tg, tb = (int(v) for v in top[r, c])
            br, bg_, bb = (int(v) for v in bot[r, c])
            line.append(f"{_CSI}38;2;{tr};{tg};{tb}m"
                        f"{_CSI}48;2;{br};{bg_};{bb}m▀")
        line.append(f"{_CSI}0m")
        out.append("".join(line))
    return "\n".join(out)


class _RawInput:
    """Non-blocking single-key reads from a tty; no-op off-tty."""

    # minimal escape-sequence decoding for the arrow keys
    _ARROWS = {"A": "arrow_up", "B": "arrow_down",
               "C": "arrow_right", "D": "arrow_left"}

    def __init__(self):
        self.enabled = sys.stdin.isatty()
        self._old = None

    def __enter__(self):
        if self.enabled:
            import termios
            import tty

            self._fd = sys.stdin.fileno()
            self._old = termios.tcgetattr(self._fd)
            tty.setcbreak(self._fd)
        return self

    def __exit__(self, *exc):
        if self._old is not None:
            import termios

            termios.tcsetattr(self._fd, termios.TCSADRAIN, self._old)

    def poll(self):
        """Returns a list of key names pressed since the last poll."""
        if not self.enabled:
            return []
        keys = []
        while select.select([sys.stdin], [], [], 0)[0]:
            ch = sys.stdin.read(1)
            if ch == "\x1b":
                rest = ""
                while select.select([sys.stdin], [], [], 0)[0]:
                    rest += sys.stdin.read(1)
                if rest.startswith("[") and rest[1:2] in self._ARROWS:
                    keys.append(self._ARROWS[rest[1:2]])
                else:
                    keys.append("esc")
            elif ch == " ":
                keys.append("space")
            else:
                keys.append(ch.lower())
        return keys


def run_live(state, step_fn, render_frame, *, steps: int = 600,
             cols: int = 0, rows: int = 0, target_fps: float = 30.0,
             wall_clock: bool = False, sim_dt: float = 1.0 / 60.0,
             max_substeps: int = 4, out=None) -> object:
    """Step the sim live, presenting each frame to the terminal.

    `step_fn(state) -> state` advances physics; `render_frame(state,
    view_proj) -> RGB uint8 image` renders (native rasterizer). Keyboard:
    WASD/space/x move, arrow keys look (the right-drag mouse-look
    analogue), +/- zoom (the scroll-wheel analogue, one tap = one wheel
    line), q/esc quits — routed to the same CameraController as the
    reference's winit events (lib.rs:74-101, camera.rs:140-151). When
    cols/rows are auto-detected, terminal resizes re-size the frame
    buffer and projection mid-run (the reference's resize path,
    rendering.rs:412-422). Returns the final state.

    `wall_clock=True` is the Q8 analogue: the reference steps physics by
    raw frame time (reference src/lib.rs:56-58). A traced per-frame dt
    would recompile the jitted step (cfg.dt is a static arg — the
    compile-time-constant design, SURVEY.md §5), so wall pacing is done
    the fixed-timestep-accumulator way: each frame consumes the elapsed
    wall time in `sim_dt` substeps (≤ `max_substeps`, so a stall never
    spirals), keeping sim time locked to wall time with bitwise-stable
    per-step physics. `steps` then counts SUBSTEPS (the sim-time budget
    is unchanged).
    """
    from physics_tpu.render.camera import Camera, CameraController, Projection

    if out is None:
        out = sys.stdout
    auto_size = cols <= 0 or rows <= 0
    if auto_size:
        try:
            ts = os.get_terminal_size()
            cols, rows = max(ts.columns, 20), max(ts.lines - 2, 10)
        except OSError:
            cols, rows = 80, 24

    cam = Camera(position=(0.0, 1.0, 8.0), yaw=-np.pi / 2, pitch=-0.1)
    proj = Projection(cols, rows * 2)
    ctl = CameraController(speed=4.0, sensitivity=2.0)
    # key-tap model: a terminal delivers presses, not releases — each tap
    # applies one frame of motion (set on poll, cleared after update)
    frame_t = 1.0 / target_fps
    last = time.perf_counter()
    shown = 0
    acc = 0.0        # wall-clock accumulator (unconsumed sim time)
    stepped = 0

    with _RawInput() as inp:
        out.write(f"{_CSI}2J")                   # clear once
        while stepped < steps:
            if wall_clock:
                # consume elapsed wall time in fixed-dt substeps
                # (bounded — a stall drops sim time instead of spiraling)
                nsub = min(int(acc / sim_dt), max_substeps,
                           steps - stepped)
                nsub = max(nsub, 1)
                acc -= nsub * sim_dt
                acc = max(acc, 0.0)
                for _ in range(nsub):
                    state = step_fn(state)
                stepped += nsub
            else:
                nsub = 1
                state = step_fn(state)
                stepped += 1
            k = stepped - 1
            now = time.perf_counter()
            dt, last = now - last, now
            acc += dt
            pressed = inp.poll()
            if "q" in pressed or "esc" in pressed:
                break
            for key in pressed:
                if key == "arrow_left":
                    ctl.process_mouse(-8.0, 0.0)
                elif key == "arrow_right":
                    ctl.process_mouse(8.0, 0.0)
                elif key == "arrow_up":
                    ctl.process_mouse(0.0, 8.0)
                elif key == "arrow_down":
                    ctl.process_mouse(0.0, -8.0)
                elif key in ("+", "="):
                    # scroll-zoom analogue (reference routes the wheel
                    # to process_scroll, src/rendering.rs:84-90 →
                    # camera.rs:146-150). Negative lines ⇒ positive
                    # scroll ⇒ move along the pitched look direction
                    # (zoom in); 0.05 lines ≈ a gentle tap at 30 fps
                    ctl.process_scroll(lines=-0.05)
                elif key == "-":
                    ctl.process_scroll(lines=0.05)
                elif key == "x":
                    ctl.process_keyboard("lshift", True)
                else:
                    ctl.process_keyboard(key, True)
            # camera dt is clamped: the first frames include jit compile
            # stalls (seconds), which would teleport a key tap
            ctl.update_camera(cam, min(max(dt, frame_t), 0.25))
            for axis in ctl.amount:
                ctl.amount[axis] = 0.0

            if auto_size:
                # resize analogue: the reference reconfigures the
                # surface + re-creates the depth texture on window
                # resize (src/rendering.rs:412-422); here the frame
                # buffer and projection aspect follow the terminal
                try:
                    ts = os.get_terminal_size()
                    nc, nr = max(ts.columns, 20), max(ts.lines - 2, 10)
                    if (nc, nr) != (cols, rows):
                        cols, rows = nc, nr
                        proj = Projection(cols, rows * 2)
                        out.write(f"{_CSI}2J")
                except OSError:
                    pass

            view_proj = (proj.matrix() @ cam.view_matrix()).astype(
                np.float32)
            img = render_frame(state, view_proj)
            fps = nsub / max(dt, 1e-6)
            out.write(f"{_CSI}H" + ansi_frame(img, cols, rows)
                      + f"\n{_CSI}0Kstep {k + 1}/{steps}  "
                      f"{fps:6.1f} steps/s  [wasd/space/x move, "
                      f"arrows look, +/- zoom, q quits]")
            out.flush()
            shown += 1
            sleep = frame_t - (time.perf_counter() - now)
            if sleep > 0 and inp.enabled:
                time.sleep(sleep)
    out.write("\n")
    return state
