"""Shared utilities: WAV I/O, quiet-gated logging, timers."""
