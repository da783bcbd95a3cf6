# sskd_tpu — make targets (reference: Makefile:19-216, with every target
# backed by real code; the reference's `python -m src.cli.main` targets hit a
# phantom CLI, SURVEY.md L8)

PY ?= python
DATA_DIR ?= data
ARTIFACTS ?= artifacts
DATASET ?= demo
STAGE ?= 2
EPOCHS ?= 3

.PHONY: help install test test-fast lint demo-data prepare integrity train \
        index eval compare serve bench export demo clean

help:
	@grep -E '^[a-z-]+:' Makefile | cut -d: -f1 | sort | uniq

test:
	$(PY) -m pytest tests/ -q

test-fast:
	$(PY) -m pytest tests/ -q -x

demo-data:
	$(PY) -m sskd_tpu.cli.main demo-data --out $(DATA_DIR)/raw/demo --samples 200

prepare:
	$(PY) -m sskd_tpu.cli.main prepare --data-dir $(DATA_DIR) --dataset $(DATASET)

integrity:
	$(PY) -m sskd_tpu.cli.main integrity --data-dir $(DATA_DIR) --dataset $(DATASET)

train:
	$(PY) -m sskd_tpu.cli.main train --data-dir $(DATA_DIR) --dataset $(DATASET) \
		--stage $(STAGE) --epochs $(EPOCHS) --output-dir $(ARTIFACTS)/models/kd_student

index:
	$(PY) -m sskd_tpu.cli.main index build \
		--model $(ARTIFACTS)/models/kd_student/best_model \
		--data $(DATA_DIR)/chunks/$(DATASET)/train.parquet \
		--out $(ARTIFACTS)/index --dtype int8

index-validate:
	$(PY) -m sskd_tpu.cli.main index validate --dir $(ARTIFACTS)/index

eval:
	$(PY) -m sskd_tpu.cli.main eval \
		--model $(ARTIFACTS)/models/kd_student/best_model \
		--data $(DATA_DIR)/raw/$(DATASET)/train.jsonl

serve:
	$(PY) -m sskd_tpu.cli.main serve --index $(ARTIFACTS)/index \
		--model $(ARTIFACTS)/models/kd_student/best_model

bench:
	$(PY) bench.py

export:
	$(PY) -m sskd_tpu.cli.main export \
		--model $(ARTIFACTS)/models/kd_student/best_model \
		--out $(ARTIFACTS)/export

demo:
	bash scripts/run_demo_pipeline.sh

clean:
	rm -rf $(ARTIFACTS)/demo .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
