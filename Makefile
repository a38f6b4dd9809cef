# Packaging + deployment targets (north rule: spark-submit --py-files)

PKG = bloomfilter_multithread_spark
DIST = dist/$(PKG).zip

.PHONY: dist submit-demo test bench clean

dist:
	mkdir -p dist
	rm -f $(DIST)
	zip -qr $(DIST) $(PKG) -x '*__pycache__*'

# end-to-end spark-submit evidence on local[*]; on a real cluster add
# --master yarn/k8s + executor confs — the job is unchanged
submit-demo: dist
	spark-submit --master 'local[8]' \
	  --conf spark.sql.shuffle.partitions=8 \
	  --py-files $(DIST) scripts/submit_build.py \
	  --input synth:20000 \
	  --bloom-key text --capacity 200000 --blocked --route \
	  --state /tmp/sketch_state_demo

test:
	python -m pytest tests/ -q

bench:
	python bench.py

clean:
	rm -rf dist
