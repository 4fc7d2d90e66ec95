# Developer entry points.  Everything runs from the repo root.

.PHONY: test test-slow bench train deploy sweep analyze native clean

test:            ## fast suite (~8 min on a 1-core host; 8 virtual CPU devices)
	python -m pytest tests/ -q

test-slow:       ## full 5000-step reference gates + CLI smokes (~40 min)
	python -m pytest tests/ -q -m slow --override-ini addopts=

bench:           ## headline benchmark on the attached accelerator (one JSON line)
	python bench.py

train:           ## resumable DQN training (ys930)
	python -m meshdqn_tpu.cli.train --config configs/ys930.yaml

deploy:          ## deploy the trained policy with per-removal re-simulation
	python -m meshdqn_tpu.cli.deploy --config configs/ys930.yaml

sweep:           ## decimation sweep + batched solve -> benchmark CSV
	python scripts/make_sweep.py

native:          ## force-rebuild the C++ kernels
	rm -f meshdqn_tpu/native/_native.so
	python -c "from meshdqn_tpu import native; assert native.available()"

clean:
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null; true
	rm -f meshdqn_tpu/native/_native.so
