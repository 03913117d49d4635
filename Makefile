# Build + run entry points (reference: makefile, Procfile)

.PHONY: all native test crawl server bench clean

all: native

native:
	$(MAKE) -C native

test:
	python -m pytest tests/ -q

crawl:
	python -m spaghettisearch_tpu.cli.crawl

server:
	python -m spaghettisearch_tpu.cli.server

bench:
	python bench.py

clean:
	$(MAKE) -C native clean
