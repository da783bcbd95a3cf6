# sskd_tpu — make targets (reference: Makefile:19-216, with every target
# backed by real code; the reference's `python -m src.cli.main` targets hit a
# phantom CLI, SURVEY.md L8)

PY ?= python
DATA_DIR ?= data
ARTIFACTS ?= artifacts
DATASET ?= demo
STAGE ?= 2
EPOCHS ?= 3

.PHONY: help install test test-fast coverage fmt lint typecheck docs \
        demo-data prepare integrity train index eval compare serve bench \
        export demo clean

help:
	@grep -E '^[a-z-]+:' Makefile | cut -d: -f1 | sort | uniq

test:
	$(PY) -m pytest tests/ -q

test-fast:
	$(PY) -m pytest tests/ -q -x

coverage:  # CI gate: fails under 75% (reference pyproject.toml:118-124)
	$(PY) -m pytest tests/ -q --cov=sskd_tpu --cov-report=term-missing \
		--cov-fail-under=75

fmt:  # (reference Makefile:25-28 fmt = black+ruff; ruff-format here)
	@command -v ruff >/dev/null 2>&1 \
		&& (ruff format sskd_tpu tests scripts && ruff check --fix sskd_tpu tests scripts) \
		|| echo "ruff not installed (CI runs it; pip install ruff locally)"

lint:  # (reference Makefile:30-33 lint = ruff+mypy)
	@command -v ruff >/dev/null 2>&1 \
		&& ruff check sskd_tpu tests scripts \
		|| echo "ruff not installed (CI runs it)"
	@command -v mypy >/dev/null 2>&1 \
		&& mypy sskd_tpu --ignore-missing-imports --no-strict-optional \
		|| echo "mypy not installed (CI runs it)"

typecheck:
	mypy sskd_tpu --ignore-missing-imports --no-strict-optional

docs:  # (reference Makefile:193-198 docs-serve via mkdocs-material)
	@command -v mkdocs >/dev/null 2>&1 \
		&& mkdocs build --strict \
		|| echo "mkdocs not installed (CI builds the site; pip install mkdocs-material)"

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
