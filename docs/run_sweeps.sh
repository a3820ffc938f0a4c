#!/bin/bash
# Regenerate every pinned strategy artifact on the chip (round-4 set).
# --quick drops the tiers that lose everywhere on this hardware (gemm,
# rs/rs2, unpadded k2 entry) — the full candidate set roughly doubles
# the wall time; drop --quick when hunting on a new toolchain.
# The sweep auto-scales measurement loop counts (~120 ms resolved device
# work each) — see plan_sweep._iters_for for why fixed counts lie.
cd /root/repo
{
timeout 9000 python -m dnn_inference_engine_tpu.cli plan-sweep --model yolov2-tiny --mode w8a8 --batch 32 --out docs/SWEEP_yolov2_w8a8_b32.json
echo "=== yolov2 b32 done rc=$? ==="
timeout 9000 python -m dnn_inference_engine_tpu.cli plan-sweep --model yolov3-tiny --mode w8a8 --batch 16 --quick --out docs/SWEEP_yolov3_w8a8_b16.json
echo "=== yolov3 b16 done rc=$? ==="
timeout 7200 python -m dnn_inference_engine_tpu.cli plan-sweep --model yolov2-tiny --mode w8a8 --batch 1 --quick --out docs/SWEEP_yolov2_w8a8_b1.json
echo "=== yolov2 b1 done rc=$? ==="
timeout 7200 python -m dnn_inference_engine_tpu.cli plan-sweep --model yolov2-tiny --mode w8a8 --batch 8 --quick --out docs/SWEEP_yolov2_w8a8_b8.json
echo "=== yolov2 b8 done rc=$? ==="
timeout 7200 python -m dnn_inference_engine_tpu.cli plan-sweep --model resnet18 --mode w8a8 --batch 32 --input-size 224 --quick --out docs/SWEEP_resnet18_w8a8_b32.json
echo "=== resnet18 done rc=$? ==="
# w8 (weight-only bf16) lane — BASELINE config 2's exact point first
# (round-5; the bf16 tier ordering differs from int8, e.g. the gemm
# tier wins mid-net at b1 where int8 XLA conv wins)
timeout 8000 python -m dnn_inference_engine_tpu.cli plan-sweep --model yolov2-tiny --mode w8 --batch 1 --out docs/SWEEP_yolov2_w8_b1.json
echo "=== yolov2 w8 b1 done rc=$? ==="
timeout 8000 python -m dnn_inference_engine_tpu.cli plan-sweep --model yolov3-tiny --mode w8 --batch 16 --quick --out docs/SWEEP_yolov3_w8_b16.json
echo "=== yolov3 w8 b16 done rc=$? ==="
timeout 8000 python -m dnn_inference_engine_tpu.cli plan-sweep --model resnet18 --mode w8 --batch 32 --input-size 224 --quick --out docs/SWEEP_resnet18_w8_b32.json
echo "=== resnet18 w8 done rc=$? ==="
echo "ALL_SWEEPS_DONE"
} > /tmp/sweeps.log 2>&1
