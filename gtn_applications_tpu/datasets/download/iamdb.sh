#!/bin/bash
# Download the IAM Handwriting Database (registration required at
# https://fki.tic.heia-fr.ch/login).
# Usage: iamdb.sh <datadir> <email> <password>

if [ $# -ne 3 ]; then
    echo "Usage: $0 datadir email password"
    echo "Register at https://fki.tic.heia-fr.ch/login for credentials."
    exit 1
fi

datadir=$1; email=$2; password=$3
mkdir -p "$datadir"
URL=https://fki.tic.heia-fr.ch/DBs/iamDB
cookies=$(mktemp)

echo "Logging in ..."
curl -X POST --cookie-jar "$cookies" \
    --data "email=${email}&password=${password}" https://fki.tic.heia-fr.ch/login

echo "Downloading metadata ..."
curl --cookie "$cookies" -o "$datadir/ascii.tgz" $URL/data/ascii.tgz

echo "Downloading line images ..."
curl --cookie "$cookies" -o "$datadir/lines.tgz" $URL/data/lines.tgz

echo "Downloading split definitions ..."
curl --cookie "$cookies" -o "$datadir/splits.zip" \
    $URL/tasks/largeWriterIndependentTextLineRecognitionTask.zip

echo "Extracting ..."
tar -xzf "$datadir/ascii.tgz" -C "$datadir"
tar -xzf "$datadir/lines.tgz" -C "$datadir"
unzip -o "$datadir/splits.zip" -d "$datadir"
rm -f "$cookies"
