.PHONY: test bench native clean smoke

native:
	$(MAKE) -C raft_tpu/_native

test: native
	python -m pytest tests/ -q

bench: native
	python bench.py

smoke: native
	python -m raft_tpu.tools.simulate --genome-size 500000 --coverage 20 \
	  --out /tmp/raft_smoke
	python -m raft_tpu.cli -e 20 -o /tmp/raft_smoke_out \
	  /tmp/raft_smoke.reads.fasta /tmp/raft_smoke.overlaps.paf
	@echo "outputs: /tmp/raft_smoke_out.*"

clean:
	$(MAKE) -C raft_tpu/_native clean
