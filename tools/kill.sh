#!/bin/bash
# parity with reference tools/kill.sh: stop all training processes
pkill -f "instaorder_tpu.cli.train" || true
