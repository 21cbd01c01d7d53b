#!/usr/bin/env python
"""Interactive quickstart menu (reference quickstart.sh:19-30 analog).

Run with no arguments for the menu, or pass a choice directly:
    python quickstart.py 1        # run a specific entry
    python quickstart.py all      # run everything non-interactive
"""

from __future__ import annotations

import subprocess
import sys

MENU = [
    ("Minimal 8-point FFT example", [sys.executable, "examples/minimal.py"]),
    ("Feature tour (planner, hardware, auto-selection)",
     [sys.executable, "-m", "fftlab.cli.features"]),
    ("Cross-algorithm benchmark table",
     [sys.executable, "-m", "fftlab.cli.benchmark", "--sizes", "64,256,1024"]),
    ("Streaming spectrum analyzer",
     [sys.executable, "-m", "fftlab.cli.analyzer", "--frames", "3"]),
    ("Pitch detection / tuner", [sys.executable, "-m", "fftlab.cli.pitch"]),
    ("FFT filtering", [sys.executable, "-m", "fftlab.cli.filter"]),
    ("2D image FFT", [sys.executable, "-m", "fftlab.cli.image"]),
    ("Power spectrum / Welch / coherence",
     [sys.executable, "-m", "fftlab.cli.spectrum"]),
    ("Convolution (direct/FFT/overlap-save/overlap-add)",
     [sys.executable, "-m", "fftlab.cli.convolution"]),
    ("Multi-device sharded pipeline demo",
     [sys.executable, "-m", "fftlab.cli.dist_demo"]),
    ("Headline benchmark (JSON)", [sys.executable, "bench.py"]),
    ("Run the test suite", [sys.executable, "-m", "pytest", "tests/", "-q"]),
]


def show_menu() -> None:
    print("=== fftlab quickstart ===")
    for i, (name, _) in enumerate(MENU, 1):
        print(f"  {i:>2}. {name}")
    print("   0. exit")


def run(idx: int) -> int:
    name, cmd = MENU[idx - 1]
    print(f"\n--- {name} ---")
    return subprocess.call(cmd)


def main() -> None:
    if len(sys.argv) > 1:
        arg = sys.argv[1]
        if arg == "all":
            for i in range(1, len(MENU)):  # skip the test suite by default
                run(i)
            return
        try:
            idx = int(arg)
        except ValueError:
            print(__doc__.strip())
            show_menu()
            return
        if not 1 <= idx <= len(MENU):
            show_menu()
            return
        run(idx)
        return
    while True:
        show_menu()
        try:
            choice = input("choice> ").strip()
        except EOFError:
            return
        if choice in ("0", "q", ""):
            return
        try:
            idx = int(choice)
            if 1 <= idx <= len(MENU):
                run(idx)
        except ValueError:
            print(f"unknown choice {choice!r}")


if __name__ == "__main__":
    main()
