"""Edge-partition + halo exchange (graph axis). Placeholder — PR5 fills this
with the shard_map all_to_all path and the Pallas remote-DMA overlap."""
AVAILABLE = False
