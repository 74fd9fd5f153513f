#!/bin/bash
work_path=$(dirname $0)
python -m instaorder_tpu.cli.test --config $work_path/config.yaml "$@"
