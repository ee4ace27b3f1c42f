# Convenience targets (the reference drove its native build from a root
# Makefile; here the only ahead-of-time native artifact is the host IO
# runtime — Pallas kernels are JIT-compiled by XLA).

.PHONY: all native test test-all bench clean

all: native

native:
	$(MAKE) -C flownet2_tf_tpu/runtime all

test:
	python -m pytest tests/ -x -q

test-all:
	RUN_SLOW=1 python -m pytest tests/ -q

bench:
	python bench.py

clean:
	$(MAKE) -C flownet2_tf_tpu/runtime clean
	find . -name __pycache__ -type d -exec rm -rf {} +
