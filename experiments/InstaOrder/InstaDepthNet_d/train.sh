#!/bin/bash
work_path=$(dirname $0)
python -m instaorder_tpu.cli.train --config $work_path/config.yaml "$@"
