# Convenience targets. The native library is optional (numpy fallbacks
# exist) but recommended for input-pipeline throughput.

.PHONY: all native test bench clean egress-day

all: native

native:
	$(MAKE) -C native

test:
	python -m pytest tests/ -q

bench:
	python bench.py

# One-command egress-day path: fetch the released test sets (md5-pinned)
# and weights, convert the TF checkpoint, and run the full reference-
# protocol evaluation — the chain the reference splits across
# weights/download_weights.sh, datasets/download_testdata.sh and
# examples/evaluation.py. Every knob is overridable, which is how the
# release drill (tests/test_release_drill.py) executes this exact target
# against fabricated artifacts:
#   make egress-day DATASETS=sun3d TESTDATA_FLAGS="--base-url file://..."
PY ?= python
DATASETS ?= sun3d rgbd mvs scenes11 nyu2
DATA_DIR ?= datasets/testdata
WEIGHTS_DIR ?= weights/artifacts
EVAL_DIR ?= evaluation_results
VARIANT ?= v1
TESTDATA_FLAGS ?=
WEIGHTS_FLAGS ?=
EVAL_FLAGS ?=

egress-day:
	mkdir -p $(DATA_DIR) $(WEIGHTS_DIR) $(EVAL_DIR)
	$(PY) datasets/download_testdata.py --datasets $(DATASETS) \
		--out-dir $(DATA_DIR) $(TESTDATA_FLAGS)
	$(PY) weights/download_and_convert_weights.py \
		--out-dir $(WEIGHTS_DIR) $(WEIGHTS_FLAGS)
	$(PY) examples/evaluation.py --dataset-dir $(DATA_DIR) \
		--weights $(WEIGHTS_DIR)/demon_tpu_$(VARIANT) \
		--datasets $(DATASETS) --out-dir $(EVAL_DIR) \
		--variant $(VARIANT) $(EVAL_FLAGS)

clean:
	$(MAKE) -C native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
