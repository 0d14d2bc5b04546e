#!/bin/bash
# Full test sweep (reference: run_test.sh) — CPU backend, 8 virtual devices.
set -e
python -m pytest tests/ -q "$@"
