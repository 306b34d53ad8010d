from .meta import (  # noqa: F401
    TiffError,
    build_metadata,
    chunk_grid,
    decode_all_pages,
    decode_metadata,
    entry_value,
    read_header,
    walk_directories,
)
from .pixels import (  # noqa: F401
    compress,
    decode_chunk,
    decompress,
    packbits,
    psnr,
    undo_float_predictor,
    undo_int_predictor,
    unpackbits,
)
from .encode import write_tiff  # noqa: F401
