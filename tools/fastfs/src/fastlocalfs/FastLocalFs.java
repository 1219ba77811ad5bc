package fastlocalfs;

import java.io.IOException;
import java.net.URI;
import java.net.URISyntaxException;

import org.apache.hadoop.conf.Configuration;
import org.apache.hadoop.fs.ChecksumFs;

/**
 * Drop-in replacement for {@code fs.AbstractFileSystem.file.impl}: the
 * standard checksummed local Fs (mirrors org.apache.hadoop.fs.local.LocalFs)
 * over {@link FastRawLocalFs}. Loaded reflectively by
 * AbstractFileSystem.createFileSystem via the (URI, Configuration)
 * constructor.
 */
public class FastLocalFs extends ChecksumFs {

  FastLocalFs(final Configuration conf) throws IOException, URISyntaxException {
    super(new FastRawLocalFs(conf));
  }

  FastLocalFs(final URI theUri, final Configuration conf)
      throws IOException, URISyntaxException {
    this(conf);
  }
}
