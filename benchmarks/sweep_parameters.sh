#!/bin/bash
# Parameter sweep — the reference grid (sweep_parameters.sh:21-36), run
# against the TPU harness. Appends to manual_benchmark_out.csv.
set -u
rm -f manual_benchmark_out.csv

benchmark=${1:-"python benchmarks/manual_benchmark.py"}
iterations=${ITERATIONS:-8}
for alpha in 0.0 1.05 1.15
do
  for num_categories in 1000000 10000000
  do
    for embed_width in 32 128
    do
      for batch in 1024 32768 131072
      do
        for hotness in 1 16 64
        do
            ${benchmark} --num_categories "${num_categories}" \
              --embed_width "${embed_width}" --batch_size "${batch}" \
              --alpha=${alpha} --hotness="${hotness}" \
              --iterations=${iterations} --enable_csv
        done
      done
    done
  done
done
