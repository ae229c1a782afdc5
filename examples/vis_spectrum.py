#!/usr/bin/env python
"""Real-time audio spectrum visualizer — analog of the reference's
pyphastft/vis_qt.py demo (PyQtGraph + pyaudio RealTimeAudioSpectrum),
driven by phastft_tpu's R2C transform.

Requires pyqtgraph + pyaudio (not part of the library's dependencies);
falls back to a terminal spectrum of a synthetic signal when they are
missing, so the demo is runnable anywhere.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from phastft_tpu import r2c_fft_f32

FFT_SIZE = 1 << 11
SAMPLE_RATE = 44100


def spectrum_db(frame: np.ndarray) -> np.ndarray:
    sre, sim = r2c_fft_f32(frame.astype(np.float32))
    power = np.asarray(sre) ** 2 + np.asarray(sim) ** 2
    return 10.0 * np.log10(power + 1e-12)


def terminal_demo() -> None:
    """No audio stack: show a scrolling spectrum of a synthetic chirp."""
    t = np.arange(FFT_SIZE) / SAMPLE_RATE
    print("synthetic chirp spectrum (pyqtgraph/pyaudio not installed)")
    for step in range(20):
        f0 = 200.0 * (1.3**step)
        frame = np.sin(2 * np.pi * f0 * t) + 0.1 * np.random.randn(FFT_SIZE)
        db = spectrum_db(frame)
        bins = db[: FFT_SIZE // 2].reshape(32, -1).max(axis=1)
        lo, hi = bins.min(), bins.max() + 1e-9
        bars = "".join(
            " .:-=+*#%@"[int(9 * (b - lo) / (hi - lo))] for b in bins
        )
        print(f"{f0:8.1f} Hz |{bars}|")


class RealTimeAudioSpectrum:
    """PyQtGraph live spectrum (mirrors the reference demo's class)."""

    def __init__(self) -> None:
        import pyaudio
        import pyqtgraph as pg
        from pyqtgraph.Qt import QtCore

        self.pg = pg
        self.QtCore = QtCore
        self.pa = pyaudio.PyAudio()
        self.stream = self.pa.open(
            format=pyaudio.paFloat32,
            channels=1,
            rate=SAMPLE_RATE,
            input=True,
            frames_per_buffer=FFT_SIZE,
        )
        self.app = pg.mkQApp("phastft-tpu spectrum")
        self.win = pg.GraphicsLayoutWidget(title="phastft-tpu spectrum")
        self.plot = self.win.addPlot()
        self.curve = self.plot.plot()
        self.win.show()
        self.timer = QtCore.QTimer()
        self.timer.timeout.connect(self.update)
        self.timer.start(30)

    def update(self) -> None:
        raw = self.stream.read(FFT_SIZE, exception_on_overflow=False)
        frame = np.frombuffer(raw, dtype=np.float32)
        freqs = np.fft.rfftfreq(FFT_SIZE, 1.0 / SAMPLE_RATE)
        self.curve.setData(freqs, spectrum_db(frame))

    def run(self) -> None:
        self.pg.exec()


def main() -> None:
    try:
        RealTimeAudioSpectrum().run()
    except ImportError:
        terminal_demo()
        sys.exit(0)


if __name__ == "__main__":
    main()
