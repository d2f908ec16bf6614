from invcompcamtrack_tpu.match.ncc import (  # noqa: F401
    ncc_score,
    patch_correlation_score,
    ncc_surface_fft,
    mosse_filter,
    mosse_response,
)
from invcompcamtrack_tpu.match.track import (  # noqa: F401
    TrackTable,
    transfer_points,
    make_track_table,
    advance_tracks,
)
from invcompcamtrack_tpu.match.lk import track_points_lk  # noqa: F401
from invcompcamtrack_tpu.match.features import shi_tomasi_corners  # noqa: F401
