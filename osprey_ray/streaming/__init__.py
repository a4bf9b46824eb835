from osprey_ray.streaming.effects import (  # noqa: F401
    EffectClient,
    EffectPump,
    MockEffectService,
)
from osprey_ray.streaming.job import StreamingJob  # noqa: F401
from osprey_ray.streaming.pubsub import (  # noqa: F401
    MockPubSub,
    PubSubLikeSubscriber,
    PubSubStream,
)
from osprey_ray.streaming.source import (  # noqa: F401
    InputStream,
    KafkaStream,
    MockBroker,
    SegmentLogStream,
)
