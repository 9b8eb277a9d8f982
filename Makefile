# Development workflow (CI-equivalent of the reference .gitlab-ci.yml:
# build -> lint -> test -> docs).

PY ?= python

.PHONY: all native test test-fast bench lint docs clean

all: native test

native:
	$(PY) -c "from hesic_tpu.codecs.build import build; print(build(force=True))"

test:
	$(PY) -m pytest tests/ -q

test-fast:
	$(PY) -m pytest tests/ -q -x -k "not Container and not roundtrip"

bench:
	$(PY) bench.py

lint:
	$(PY) -m compileall -q hesic_tpu tests bench.py __graft_entry__.py

docs:
	@echo "markdown docs: docs/index.md (+ README.md, module docstrings)"
	@ls docs/*.md

clean:
	rm -f hesic_tpu/codecs/librans_tpu.so
	find . -name __pycache__ -type d -exec rm -rf {} +
