#!/bin/bash
# Model downloads (same released artifacts the reference uses,
# reference:scripts/download_models.sh). The propagation weights are a torch
# .pth; deva_tpu converts them on load (deva_tpu/models/convert.py) — or run
# scripts/convert_reference_weights.py once to produce a .npz.
mkdir -p ./saves
wget -P ./saves/ https://github.com/hkchengrex/Tracking-Anything-with-DEVA/releases/download/v1.0/DEVA-propagation.pth

# Detector checkpoints for the text/automatic pipelines. deva_tpu drives the
# detectors through `transformers`; download the HF variants:
#   GroundingDINO: IDEA-Research/grounding-dino-tiny (or -base)
#   SAM:           facebook/sam-vit-huge (or -large / -base)
# e.g.  huggingface-cli download IDEA-Research/grounding-dino-tiny
#       huggingface-cli download facebook/sam-vit-huge
