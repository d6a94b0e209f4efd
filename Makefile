# Convenience targets (the reference ships tox/travis, W15; this repo's
# gate is the pytest suite on a virtual 8-device CPU mesh).

.PHONY: test test-fast test-slow bench bench-train lint dryrun ci

# CI-equivalent gate (reference ships .travis.yml/tox): lint + the full
# suite with the run recorded under logs/ (latest green: logs/test_full_r03.log)
ci:
	mkdir -p logs
	python -m compileall -q ficsr_tpu tests *.py
	python -m pytest tests/ -q > logs/test_full_$$(date +%Y%m%d).log 2>&1; \
	    rc=$$?; tail -5 logs/test_full_$$(date +%Y%m%d).log; exit $$rc

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -m "not slow"

test-slow:
	python -m pytest tests/ -q -m slow

bench:
	python bench.py

bench-train:
	python bench.py --train

dryrun:
	python -c "import jax; jax.config.update('jax_platforms','cpu'); \
	import os; os.environ['XLA_FLAGS']=os.environ.get('XLA_FLAGS','')+' --xla_force_host_platform_device_count=8'; \
	import __graft_entry__ as g; g.dryrun_multichip(8)"

# the exact BASELINE config-4 program (256^2, d_layers=5) on the
# virtual mesh — slow on 1 CPU core; the fast dryrun above is the gate
dryrun-production:
	python -c "import jax; jax.config.update('jax_platforms','cpu'); \
	import os; os.environ['XLA_FLAGS']=os.environ.get('XLA_FLAGS','')+' --xla_force_host_platform_device_count=8'; \
	import __graft_entry__ as g; g.dryrun_multichip(8, production=True)"

lint:
	python -m pyflakes ficsr_tpu tests *.py 2>/dev/null || true
