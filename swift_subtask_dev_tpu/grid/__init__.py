from .cellgrid import CellGrid, bucket_fields, rebucket_offsets, global_positions
