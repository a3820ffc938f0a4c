#!/bin/bash
cd /root/repo
{
timeout 3000 python -m dnn_inference_engine_tpu.cli plan-sweep --model yolov2-tiny --mode w8a8 --batch 32 --out docs/SWEEP_yolov2_w8a8_b32.json
echo "=== yolov2 done rc=$? ==="
timeout 2400 python -m dnn_inference_engine_tpu.cli plan-sweep --model resnet18 --mode w8a8 --batch 32 --input-size 224 --quick --out docs/SWEEP_resnet18_w8a8_b32.json
echo "=== resnet18 done rc=$? ==="
timeout 2400 python -m dnn_inference_engine_tpu.cli plan-sweep --model yolov3-tiny --mode w8a8 --batch 16 --out docs/SWEEP_yolov3_w8a8_b16.json
echo "=== yolov3 done rc=$? ==="
echo "ALL_SWEEPS_DONE"
} > /tmp/sweeps.log 2>&1
