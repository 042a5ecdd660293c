"""Dataset factory (SURVEY.md §2.1 L7): converters from raw datasets to
the canonical temporal tfrecord schema, offline phi extraction, and
record inspection tools."""

from human_dynamics_tpu.datasets.common import (
    encode_jpeg,
    decode_jpeg,
    crop_person,
    clean_tube,
)
from human_dynamics_tpu.datasets.test_records import (
    save_seq_to_test_tfrecord,
)
from human_dynamics_tpu.datasets.phi_extractor import FeatureExtractor
from human_dynamics_tpu.datasets.tube_writer import TubeConverter
