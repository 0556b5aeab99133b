# developer convenience targets (the package itself is pure Python;
# the native kernels build lazily on first use)

.PHONY: test bench native clean goldens

test:
	python -m pytest tests/ -q

bench:
	python bench.py

native:
	$(MAKE) -C volren_tpu/native

goldens:
	python tests/test_goldens.py

clean:
	$(MAKE) -C volren_tpu/native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
