#!/bin/bash
# BERT full-schedule chain (VERDICT r4 #2 + #5), r5 WordPiece edition:
# stage-1 20 epochs at the validated production batch (cfg/train_bert_b64.yml,
# every LR milestone + in-training validation + per-epoch checkpoints) ->
# stage-2 36 epochs at B=128 (cfg/fusion_bert_b128.yml) chained from the
# stage-1 epoch-20 encoder checkpoints -> src/test.py on the REAL-protocol
# pair list (357,900 pairs, table mode, identification at test_sub=1193)
# from the stage-2 epoch-36 artifacts.
#
# Unlike the first (pre-WordPiece) run of this chain, captions tokenize
# through the corpus-trained WordPiece vocab (data/wordpiece.py) — real
# subword token ids, real embedding-row-reuse distribution (DEVIATIONS #20).
# Images stay synthetic (Face2Text images are not redistributable).
set -x
cd /root/repo
S1=checkpoints/face2text/Train/BERT_arcface/bert

python src/train_encoders_bert.py --cfg cfg/train_bert_b64.yml --synthetic \
  --data_dir caption_assets/face2text \
  > soak_logs/stage1_bert_b64_wordpiece.log 2>&1
rc1=$?
echo "stage1 rc=$rc1"
if [ $rc1 -ne 0 ]; then exit $rc1; fi

python src/fusion_bert.py --cfg cfg/fusion_bert_b128.yml --synthetic \
  --data_dir caption_assets/face2text \
  --text_encoder_path "$S1/bert_text_encoder_20" \
  --image_encoder_path "$S1/arcface_image_encoder_20" \
  > soak_logs/stage2_bert_b128_wordpiece.log 2>&1
rc2=$?
echo "stage2 rc=$rc2"
if [ $rc2 -ne 0 ]; then exit $rc2; fi

S2=checkpoints/face2text/Fusion/BERT_arcface/fcfm
python src/test.py --cfg cfg/test.yml --synthetic \
  --data_dir caption_assets/face2text \
  --batch_size 256 \
  --text_encoder_path "$S2/encoder_BERT_fcfm_36" \
  --image_encoder_path "$S2/fusion_fcfm_arcface_36" \
  --fusion_net_path "$S2/fusion_fcfm_arcface_36" \
  --test_pair_list caption_assets/face2text/test_299_sub.txt \
  --test_sub 1193 --is_ident --eval_table_mode \
  > soak_logs/test_full_protocol_trained.log 2>&1
rc3=$?
echo "test rc=$rc3"
exit $rc3
