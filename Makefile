# Developer entry points.  Everything runs from the repo root.

.PHONY: test test-slow bench train deploy sweep analyze native clean

# Round-4 measurement (this 1-core host): fast suite 204 tests, 9m01s CPU /
# 24m21s wall while SHARING the core with a live 32-env trainer; ~10 min
# wall on a quiet host.  The 10 heaviest solver/train gates moved to -m slow.
test:            ## fast suite (~10 min quiet 1-core host; 8 virtual CPU devices)
	python -m pytest tests/ -q

test-slow:       ## full 5000-step reference gates + heavy solver/train gates (~60 min)
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
