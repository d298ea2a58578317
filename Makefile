# Developer entry points (the reference had src/Makefile producing the
# Asterisk module; here the Python package needs no build — only the
# optional native host runtime does).

.PHONY: all native test bench clean

all: native

native:
	$(MAKE) -C native

test:
	python -m pytest tests/ -q

bench:
	python bench.py

clean:
	$(MAKE) -C native clean
	rm -rf .pytest_cache build dist *.egg-info
