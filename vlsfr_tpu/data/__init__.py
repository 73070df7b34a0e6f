from vlsfr_tpu.data.records import FaceRecordReader, FaceRecordWriter, MultiSourceReader
from vlsfr_tpu.data.pipeline import FFCBatch, FFCPipeline, InstanceStream, PairStream
