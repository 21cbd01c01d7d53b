"""Runnable demo entry points (`python -m fftlab.cli.<demo>`).

The reference compiles every .c file both as a library object and as a
standalone demo binary (Makefile:118-128, `-DLIB_BUILD` guard). The
analog here: each demo is a module with a `main()`, runnable via
`python -m` (SURVEY.md §1 'every module is importable AND runnable').

Demos:
  features   v2 feature tour: auto-selection, plans, hardware caps
             (examples/demo_v2_features.c)
  benchmark  cross-algorithm benchmark table (benchmarks/benchmark_all.c)
  analyzer   streaming spectrum analyzer (examples/realtime_analyzer.c)
  pitch      pitch detection / tuner (examples/pitch_detection.c)
  filter     FFT filtering demo (applications/fft_filtering.c)
  image      2D FFT image demo (applications/image_fft.c)
"""
