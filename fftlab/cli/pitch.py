"""Pitch detection / tuner demo (examples/pitch_detection.c).

Runs the three detectors (spectral peak, HPS, autocorrelation) on test
tones and prints the combined estimate with note + cents tuner output.
"""

from __future__ import annotations

import argparse



def main() -> None:
    from fftlab.utils.compat import prefer_cpu_for_complex

    prefer_cpu_for_complex()
    from fftlab.dsp.pitch import detect_pitch
    from fftlab.utils.signals import generate_multi_tone

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--freqs", default="110,220,261.63,440,446")
    ap.add_argument("--fs", type=float, default=8192.0)
    ap.add_argument("--n", type=int, default=4096)
    args = ap.parse_args()

    print(f"{'true Hz':>9} {'est Hz':>9} {'note':<5} {'cents':>7} "
          f"{'conf':>5}  estimates (peak/HPS/autocorr)")
    for f in (float(s) for s in args.freqs.split(",")):
        # Tone with harmonics, like a plucked string.
        x = generate_multi_tone(args.n, [f, 2 * f, 3 * f],
                                [1.0, 0.5, 0.25], args.fs)
        r = detect_pitch(x, args.fs)
        ests = "/".join(f"{e:.1f}" for e in r["estimates"])
        print(f"{f:>9.2f} {r['pitch']:>9.2f} {r['note']:<5} "
              f"{r['cents']:>+7.1f} {r['confidence']:>5.2f}  {ests}")


if __name__ == "__main__":
    main()
