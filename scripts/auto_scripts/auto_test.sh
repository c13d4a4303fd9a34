#!/usr/bin/env bash
# Parameterized transient sweep (reference assets/auto_scripts/auto_test.sh):
#   auto_test.sh <folder-with-foam-xmls> <scene-dir-name>
# Renders every foam-N*/nw-foam-N* variant with the reference's per-N
# sample budgets, logging to log.txt.
test_folder=$1
sample_nums=(0 0 2 2 2 3 4 5)

for ((num=5;num<=7;num++)); do
    sample_num=$((${sample_nums[$num]}*100000))
    for pref in "foam" "nw-foam"; do
        for file in `ls ${test_folder}${pref}-${num}*.xml 2>/dev/null`; do
            file_name=${file##*/}
            echo "Processing '$file_name' with ${sample_num} samples."
            python ./render.py --scene $2 --name ${file_name} \
                --iter_num ${sample_num} --type bdpt -a --no_save_fig \
                --no_watermark >> log.txt
        done
    done
done
