# Common tasks. Tests run on CPU (CVAD_PLATFORM=cpu via tests/conftest.py);
# bench and demos use the attached TPU.

.PHONY: test test-fast bench native demo clean

test:
	python -m pytest tests/

test-fast:
	python -m pytest tests/test_losses.py tests/test_data.py tests/test_models.py -q

bench:
	python bench.py

native:
	$(MAKE) -C native

demo:
	python -m cvad_tpu.cli train --preset avenue_improved --epochs 5 \
	  --out runs/demo --n-synthetic 128 --set train.dtype=bfloat16

clean:
	rm -rf runs/*/checkpoints /tmp/cvad_* native/libcvaddecode.so
	find . -name __pycache__ -type d -exec rm -rf {} +
