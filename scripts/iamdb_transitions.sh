#!/bin/bash
# End-to-end pruned n-gram transition pipeline for IAM wordpieces
# (parity: /root/reference/scripts/iamdb_transitions.sh).

DATA=${DATA:-"<data_path>"}
WORK=${WORK:-"/tmp/iamdb_transitions"}
mkdir -p $WORK
TRAIN_TEXT=$WORK/iamdb_train_text.txt
TRAIN_TOKENS=$WORK/iamdb_train_tokens.txt
WP_TOKENS=${WP_TOKENS:-$WORK/word_pieces_tokens_1000.txt}
WP_LEXICON=${WP_LEXICON:-$WORK/word_pieces_lex_1000.txt}

# Pruning values
P1=0
P2=5
P3=10
SAVE=$WORK/transitions_wp1k_${P1}_${P2}_${P3}.bin
BLANK="--blank optional"

# Step 1: tokenized training text
python -m gtn_applications_tpu.datasets.iamdb --data_path $DATA \
    --save_text $TRAIN_TEXT --save_tokens $TRAIN_TOKENS

# Step 2: wordpiece vocabulary + lexicon (if not already built)
if [ ! -f $WP_TOKENS ]; then
  python -m gtn_applications_tpu.scripts.make_wordpieces --dataset iamdb \
      --data_dir $DATA --output_prefix $WORK/word_pieces --num_pieces 1000
fi

# Step 3: transition graph
python -m gtn_applications_tpu.scripts.build_transitions \
    --data_path $TRAIN_TEXT --tokens $WP_TOKENS --lexicon $WP_LEXICON \
    --save_path $SAVE --prune $P1 $P2 $P3 $BLANK
