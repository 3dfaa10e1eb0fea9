from .decoder import DecoderSpec, decode, decode_train, init_decoder_params, fold_decoder_params
from .encoder import EncoderSpec, encode_points, encode_train, init_encoder_params, fold_encoder_params
