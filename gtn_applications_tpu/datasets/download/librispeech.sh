#!/bin/bash
# Download LibriSpeech from OpenSLR.
# Usage: librispeech.sh <datadir>

if [ $# -ne 1 ]; then
    echo "Usage: $0 datadir"
    exit 1
fi
datadir=$1
mkdir -p "$datadir"
for f in train-clean-100.tar.gz dev-clean.tar.gz dev-other.tar.gz \
         test-clean.tar.gz test-other.tar.gz; do
    wget "https://www.openslr.org/resources/12/${f}" -O "${datadir}/${f}"
    tar -xzf "${datadir}/${f}" -C "${datadir}"
done
