#!/bin/bash
# Round-5 two-speaker A->B experiment: full reference workflow on the real
# chip. Stages log to runs_r05/*.log; exit on first failure.
# Launch: nohup bash runs_r05/run_pipeline.sh > runs_r05/pipeline.log 2>&1 &
set -e
cd /root/repo
D=runs_r05/data
export HF_HUB_OFFLINE=1 TRANSFORMERS_OFFLINE=1

echo "=== stage 1: encoder (A+B corpus, mfcc distillation, multi-step) $(date)"
python -m tinyvc_tpu.cli.train_encoder \
  --dataset-cache $D/cacheAB -e 40 -b 16 \
  --log-interval 48 --save-interval 480 \
  -path runs_r05/models/encoder --log-dir runs_r05/logs_enc \
  --device-data 2>&1 | tee runs_r05/enc.log

echo "=== stage 2: decoder GAN (speaker B, 30k steps, multi-step) $(date)"
python -m tinyvc_tpu.cli.train_decoder \
  --dataset-cache $D/cacheB -encp runs_r05/models/encoder \
  -decp runs_r05/models/decoder -step 30000 -d-join 10000 -b 16 \
  --log-interval 50 --save-interval 500 \
  --log-dir runs_r05/logs_dec --device-data 2>&1 | tee runs_r05/dec.log

echo "=== stage 3: extract speaker-B kNN index $(date)"
python -m tinyvc_tpu.cli.extract_index \
  --dataset-cache $D/cacheB -encp runs_r05/models/encoder \
  -size 2048 --stride 4 -o runs_r05/models/index_B.npy 2>&1 | tee runs_r05/idx.log

echo "=== stage 4: convert held-out speaker-A utterances -> B $(date)"
# corpus-stat pitch shift: median f0 A 117.7 Hz -> B 235.4 Hz = +11.99 st
python -m tinyvc_tpu.cli.infer \
  -i $D/eval_A -o runs_r05/out_shift \
  -encp runs_r05/models/encoder -decp runs_r05/models/decoder \
  -idx runs_r05/models/index_B.npy -p 11.99 2>&1 | tee runs_r05/infer1.log
python -m tinyvc_tpu.cli.infer \
  -i $D/eval_A -o runs_r05/out_noshift \
  -encp runs_r05/models/encoder -decp runs_r05/models/decoder \
  -idx runs_r05/models/index_B.npy -p 0.0 2>&1 | tee runs_r05/infer2.log

echo "=== pipeline complete $(date)"
