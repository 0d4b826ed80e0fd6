#!/usr/bin/env bash
python base.py --config configs/baseline.yaml --data_dir "${1:-./data}" --dataset "${2:-vidvrd}" --preprocess
