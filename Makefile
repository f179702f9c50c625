# Developer entry points.

.PHONY: test native bench clean

test:
	python -m pytest tests/ -q

native:
	$(MAKE) -C crimac_unet_tpu/native

bench:
	python bench.py

clean:
	$(MAKE) -C crimac_unet_tpu/native clean
	find . -name __pycache__ -type d -prune -exec rm -rf {} +
