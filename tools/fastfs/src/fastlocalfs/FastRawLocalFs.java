package fastlocalfs;

import java.io.IOException;
import java.net.URI;
import java.net.URISyntaxException;

import org.apache.hadoop.conf.Configuration;
import org.apache.hadoop.fs.DelegateToFileSystem;
import org.apache.hadoop.fs.FsConstants;

/**
 * AbstractFileSystem counterpart of {@link NioRawLocalFileSystem}
 * (mirrors org.apache.hadoop.fs.local.RawLocalFs, which is
 * package-private and therefore not subclassable from here). Needed
 * because Structured Streaming's checkpoint manager goes through the
 * FileContext API, which resolves {@code file:} via
 * {@code fs.AbstractFileSystem.file.impl}, not {@code fs.file.impl}.
 */
public class FastRawLocalFs extends DelegateToFileSystem {

  FastRawLocalFs(final Configuration conf) throws IOException, URISyntaxException {
    this(FsConstants.LOCAL_FS_URI, conf);
  }

  FastRawLocalFs(final URI theUri, final Configuration conf)
      throws IOException, URISyntaxException {
    super(theUri, new NioRawLocalFileSystem(), conf,
        FsConstants.LOCAL_FS_URI.getScheme(), false);
  }

  @Override
  public int getUriDefaultPort() {
    return -1; // no default port for file:// (same as RawLocalFs)
  }

  @Override
  public boolean isValidName(String src) {
    return true; // local paths allow anything (same as RawLocalFs)
  }
}
