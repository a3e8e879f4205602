"""Command-line entry points (the counterpart of the reference's root
scripts): preprocess, train_encoder, train_decoder, extract_index, infer,
infer_streaming, infer_webui, export, audio_device_list, bench."""
